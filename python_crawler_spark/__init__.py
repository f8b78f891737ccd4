"""python_crawler_spark — a PySpark-native URL-frontier & fetch-scheduler engine.

A from-scratch rebuild (NOT a port) of the capabilities of the reference
crawler ``seasons-in-the-sun/python-crawler`` (see ``/root/reference``):
seed lists -> frontier expansion -> seen-set dedup -> politeness
scheduling -> gating rules -> fetch (synthetic page join in-sandbox) ->
vectorized HTML parse -> typed article/company/image tables, with
checkpoint/resume per round.

Everything is expressed as Spark DataFrame dataflow; Python only runs
inside Arrow-vectorized pandas UDFs (parse/decode/bloom kernels).
"""

__version__ = "0.1.0"

"""The crawl plan: frontier round loop (SURVEY §3.4).

    seeds -> [round r: enrich/canonicalize -> robots gate ->
    batch dedup -> seen anti-join (bloom + exact) -> schedule ->
    fetch (synthetic web) -> parse/expand -> outputs + new frontier;
    seen += fetched; snapshot r committed] until frontier empty

Each round is one Spark DAG; the driver only counts rows to decide
termination (no .collect() of data). Ordering is carried as the
priority tuple and reconstructed by sort — equality with the
sequential oracle (tests/oracle.py) is over (source_rank, priority)
order, per-source virtual clocks, seen-set membership, and extracted
records.

Reference lifecycle being re-expressed: weixin_public.py:126-266,
chuansongmen.py:34-97, tianyan_crawler.py:110-178,
tianyan_extractor.py:15-30 — as one declarative dataflow.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import bucket_col
from ..functions.urls import (
    absolutize_col,
    canonicalize_split,
    host_col,
    pic_signature_col,
    query_param_col,
)
from ..operators import gating
from ..operators.dedup import (
    batch_first_occurrence,
    build_bloom_filters,
    dedup_against_seen,
)
from ..operators.components import _rdd_ids as _persistent_rdd_ids
from ..operators.components import _unpersist as _unpersist_rdds
from ..operators.multimodal import fetch_and_decode_images, with_rehost_id
from ..operators.scheduler import (
    PRIORITY_COLS,
    SOURCE_RANK,
    STAGE_CHILD,
    STAGE_LIST,
    STAGE_ROOT,
    CheckpointHandle,
    free_schedule_checkpoints,
    pack_order,
    packed_dedup_order_col,
    schedule,
)
from ..parse.udfs import canonicalize_urls_udf, udfs_for
from ..sources import worldgen
from ..sources.tables import SnapshotStore
from ..sources.worldgen import CSM_BASE, TYC_BASE, WEIXIN_BASE, WorldSpec

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("seed_id", T.IntegerType()),
        T.StructField("line_no", T.IntegerType()),
        T.StructField("stage", T.IntegerType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("link_idx", T.IntegerType()),
        T.StructField("attempt", T.IntegerType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("cover", T.StringType()),
        T.StructField("crawl_delay", T.DoubleType()),
        # S5/S7 fetch identity: what a production fetch stage acts on.
        T.StructField("render", T.BooleanType()),
        T.StructField("ua_id", T.IntegerType()),
        T.StructField("proxy_id", T.IntegerType()),
    ]
)

FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA.fields]

SEEN_COLS = ["bucket", "key_hash", "dedup_key", "url", "round"]

MASK63 = 0x7FFFFFFFFFFFFFFF


def _delay_hash(url_col):
    """Matches worldgen._h('delay', url): xxhash64 of 'delay\\x1f'+url,
    sign-masked — computed JVM-side."""
    return F.xxhash64(F.concat(F.lit("delay\x1f"), url_col)).bitwiseAND(F.lit(MASK63))


def crawl_delay_col(source, stage, url):
    """Virtual politeness delay per (source, stage) — the reference's
    sleep budget as a column (SURVEY O5-O7, BASELINE.md)."""
    hd = _delay_hash(url)
    return (
        F.when(source == "weixin", F.when(stage == STAGE_ROOT, 5.0).otherwise(1.0))
        .when(source == "chuansongmen", F.lit(3.0))
        .when(
            source == "tianyan",
            F.when(stage <= STAGE_LIST, 8.0 + (hd % 7001) / 1000.0).otherwise(
                15.0 + (hd % 20001) / 1000.0
            ),
        )
        .otherwise(F.lit(0.0))
    )


def with_fetch_identity(df: DataFrame) -> DataFrame:
    """S5/S7: attach (render, ua_id, proxy_id) fetch-identity columns,
    JVM-side, in hash parity with worldgen.fetch_identity /
    render_required. Retries rotate identity because the formula is
    (stable-url-base + attempt) mod pool — the reference's
    install_new_driver rotation (tianyan_crawler.py:145-152) as a
    deterministic column."""
    render = (
        (F.col("source") == "weixin") & (F.col("stage") == STAGE_ROOT)
    ) | (F.col("source") == "tianyan")

    def rotating(tag: str, n: int):
        base = F.xxhash64(F.concat(F.lit(tag + "\x1f"), F.col("url"))).bitwiseAND(
            F.lit(MASK63)
        )
        # pmod the 63-bit base BEFORE adding attempt: base + attempt
        # could wrap past 2^63-1 (negative result, or an ANSI-mode
        # throw), diverging from the oracle's unbounded-int arithmetic.
        # (b % n + a) % n == (b + a) % n for non-negative b, a, so
        # parity with worldgen.fetch_identity is exact (ADVICE r2).
        return F.pmod(F.pmod(base, F.lit(n)) + F.col("attempt"), F.lit(n)).cast("int")

    return (
        df.withColumn("render", render)
        .withColumn("ua_id", rotating("ua", len(worldgen.UA_POOL)))
        .withColumn("proxy_id", rotating("proxy", len(worldgen.PROXY_POOL)))
    )


@dataclass
class CrawlConfig:
    spec: WorldSpec = field(default_factory=WorldSpec)
    n_buckets: int = 16
    n_salts: int = 4
    use_bloom: bool = True
    fixed_date: str = "2016-06-01"  # X10 determinism: fixed clock
    max_rounds: int = 8
    first_seed: int = 0   # F2 resume window (tianyan semantics, applied to all)
    seed_limit: int | None = None
    # Parse family: 'dialect' = compiled-regex kernels over the clean
    # worldgen markup (fast path); 'tolerant' = stdlib-html.parser DOM
    # kernels (parse/tolerant.py) for real-world markup. dirty_web=True
    # makes worldgen emit deterministically messed-up markup (reordered
    # /requoted/uppercased attributes, unclosed tails) — the e2e world
    # the tolerant family is verified against.
    html_parser: str = "dialect"
    dirty_web: bool = False
    # Seen-set prefilter family: 'bloom' (default), 'cuckoo' (partial-
    # key cuckoo filter — deletable, ~60x lower FPR at 3x bits/item,
    # operators/cuckoo.py), or 'none' (exact anti-join only).
    # use_bloom=False forces 'none' (back-compat). Filters are
    # maintained INCREMENTALLY: each round rebuilds only the hash
    # buckets that round touched (_update_filters).
    filter_family: str = "bloom"


class CrawlRun:
    """Driver for the round loop. Holds accumulated outputs as
    DataFrames (lineage truncated per round via localCheckpoint)."""

    def __init__(
        self,
        spark: SparkSession,
        config: CrawlConfig | None = None,
        store: SnapshotStore | None = None,
    ):
        self.spark = spark
        self.cfg = config or CrawlConfig()
        self.U = udfs_for(self.cfg.html_parser)
        fam = "none" if not self.cfg.use_bloom else self.cfg.filter_family
        if fam not in ("bloom", "cuckoo", "none"):
            raise ValueError(f"unknown filter_family: {fam!r}")
        self.filter_family = fam
        self.filters: DataFrame | None = None
        self._filter_ckpt_ids: set[int] = set()
        self.store = store
        self.rules = gating.rules_df(spark).cache()
        self.round = 0
        self.seen: DataFrame = spark.createDataFrame(
            [], "bucket int, key_hash long, dedup_key string, url string, round int"
        )
        self.fetch_log: DataFrame | None = None
        self.articles: DataFrame | None = None
        self.articles_text: DataFrame | None = None
        self.companies: DataFrame | None = None
        self.images: DataFrame | None = None
        self.metrics: list[dict] = []

    # ------------------------------------------------------------ frontier

    def initial_frontier(self) -> DataFrame:
        """Seeds -> root fetches (SURVEY O1: line order is carried as a
        column, F1-F3 seed gates applied)."""
        seeds = self.spark.createDataFrame(
            worldgen.gen_seeds(self.cfg.spec),
            "seed_id int, source string, line_no int, name string, url string",
        )
        seeds = seeds.filter(F.length(F.trim("name")) > 0)  # F1
        lo = self.cfg.first_seed
        seeds = seeds.filter(F.col("line_no") >= F.lit(lo))  # F2 resume
        if self.cfg.seed_limit is not None:
            seeds = seeds.filter(F.col("line_no") < F.lit(self.cfg.seed_limit))
        seeds = gating.filter_blacklisted_names(seeds, self.rules)  # F3
        root = seeds.select(
            "url",
            "source",
            "name",
            "seed_id",
            "line_no",
            F.lit(STAGE_ROOT).alias("stage"),
            F.lit(0).alias("page_no"),
            F.lit(-1).alias("link_idx"),
            F.lit(0).alias("attempt"),
            F.lit(0).alias("depth"),
            F.lit("").alias("title"),
            F.lit("").alias("summary"),
            F.lit("").alias("cover"),
            crawl_delay_col(F.col("source"), F.lit(STAGE_ROOT), F.col("url")).alias(
                "crawl_delay"
            ),
        )
        return with_fetch_identity(root)

    def _enrich(self, frontier: DataFrame) -> DataFrame:
        """canon_url, dedup_key (title for weixin articles — the
        reference dedups weixin by title, J1/F7; url otherwise; attempt
        suffix lets O8 retries bypass the seen set), key_hash, bucket,
        host."""
        f = canonicalize_split(frontier, canonicalize_urls_udf)
        base_key = F.when(
            (F.col("source") == "weixin") & (F.col("stage") == STAGE_CHILD),
            F.col("title"),
        ).otherwise(F.col("canon_url"))
        key = F.when(
            F.col("attempt") > 0,
            F.concat(base_key, F.lit("#a"), F.col("attempt").cast("string")),
        ).otherwise(base_key)
        f = f.withColumn("dedup_key", key)
        f = f.withColumn("key_hash", F.xxhash64("dedup_key"))
        f = f.withColumn("bucket", bucket_col(F.col("key_hash"), self.cfg.n_buckets))
        f = f.withColumn("host", host_col(F.col("url")))
        return f

    # --------------------------------------------------------------- fetch

    def _fetch(self, plan: DataFrame) -> DataFrame:
        """The fetch stage: mapInPandas over the scheduled plan; the
        synthetic web (worldgen.fetch_url) substitutes live HTTP
        (SURVEY S6-S8). In production this is the batch HTTP client
        with a per-executor session."""
        spec = self.cfg.spec
        out_schema = T.StructType(
            plan.schema.fields
            + [T.StructField("kind", T.StringType()), T.StructField("html", T.StringType())]
        )

        dirty = self.cfg.dirty_web

        def run(batches):
            for pdf in batches:
                kinds, htmls = [], []
                for url, att in zip(pdf["url"], pdf["attempt"]):
                    kind, html = worldgen.fetch_url(
                        url, attempt=int(att), spec=spec, dirty=dirty
                    )
                    kinds.append(kind)
                    htmls.append(html)
                yield pdf.assign(kind=kinds, html=htmls)

        return plan.mapInPandas(run, out_schema)

    # ----------------------------------------------------------- expansion

    def _child(self, df: DataFrame, url, stage, page_no, link_idx, title=None,
               summary=None, cover=None, attempt=None) -> DataFrame:
        src = F.col("source")
        stage_c = F.lit(stage) if isinstance(stage, int) else stage
        out = df.select(
            url.alias("url"),
            "source",
            "name",
            "seed_id",
            "line_no",
            stage_c.cast("int").alias("stage"),
            (F.lit(page_no) if isinstance(page_no, int) else page_no).cast("int").alias("page_no"),
            (F.lit(link_idx) if isinstance(link_idx, int) else link_idx).cast("int").alias("link_idx"),
            (F.lit(0) if attempt is None else attempt).cast("int").alias("attempt"),
            (F.col("depth") + 1).alias("depth"),
            (F.lit("") if title is None else title).alias("title"),
            (F.lit("") if summary is None else summary).alias("summary"),
            (F.lit("") if cover is None else cover).alias("cover"),
        )
        return with_fetch_identity(
            out.withColumn(
                "crawl_delay", crawl_delay_col(src, F.col("stage"), F.col("url"))
            )
        )

    def _expand_weixin_list(self, fetched: DataFrame) -> DataFrame:
        """D1 + F4/F5/F6: list page -> article candidates in DOM order."""
        lists = fetched.filter(
            (F.col("source") == "weixin") & (F.col("stage") == STAGE_ROOT)
        )
        items = lists.withColumn("items", self.U["parse_article_list"]("html")).select(
            "source", "name", "seed_id", "line_no", "depth",
            F.posexplode("items").alias("pos", "item"),
        )
        items = items.filter(F.col("item.cover") != "")  # F4
        items = items.select(
            "source", "name", "seed_id", "line_no", "depth", "pos",
            F.col("item.href").alias("href"),
            F.col("item.title").alias("title"),
            F.col("item.summary").alias("summary"),
            F.col("item.cover").alias("cover"),
        )
        items = gating.apply_title_rules(items, self.rules, account_col="name")  # F5+F6
        return self._child(
            items,
            url=absolutize_col(F.col("href"), F.lit(WEIXIN_BASE)),  # X4
            stage=STAGE_CHILD,
            page_no=0,
            link_idx=F.col("pos"),
            title=F.col("title"),
            summary=F.col("summary"),
            cover=F.col("cover"),
        )

    def _expand_csm_account(self, fetched: DataFrame) -> DataFrame:
        """D9 + X5: account root -> list pages 1..max_page-1."""
        accts = fetched.filter(
            (F.col("source") == "chuansongmen") & (F.col("stage") == STAGE_ROOT)
        ).withColumn("max_page", self.U["parse_max_page"]("html"))
        pages = accts.filter(F.col("max_page") > 1).select(
            "source", "name", "seed_id", "line_no", "depth", "url",
            F.explode(F.sequence(F.lit(1), F.col("max_page") - 1)).alias("pg"),
        )
        return self._child(
            pages,
            url=F.concat(
                F.col("url"), F.lit("?start="), ((F.col("pg") - 1) * 12).cast("string")
            ),
            stage=STAGE_LIST,
            page_no=F.col("pg"),
            link_idx=-1,
        )

    def _expand_csm_list(self, fetched: DataFrame) -> DataFrame:
        """D8 + F14 + X4: list page -> article URLs in DOM order."""
        lists = fetched.filter(
            (F.col("source") == "chuansongmen") & (F.col("stage") == STAGE_LIST)
        )
        links = lists.withColumn("links", self.U["parse_links"]("html")).select(
            "source", "name", "seed_id", "line_no", "depth", "page_no",
            F.posexplode("links").alias("pos", "href"),
        )
        links = gating.link_shape_filter(links, self.rules, "chuansongmen")  # F14
        return self._child(
            links,
            url=absolutize_col(F.col("href"), F.lit(CSM_BASE)),
            stage=STAGE_CHILD,
            page_no=F.col("page_no"),
            link_idx=F.col("pos"),
        )

    def _expand_tianyan_search(self, fetched: DataFrame) -> tuple[DataFrame, DataFrame]:
        """F12 anti-bot -> retry rows (O8); else first query_name link
        -> detail child (F13 drops empty results)."""
        searches = fetched.filter(
            (F.col("source") == "tianyan") & (F.col("stage") == STAGE_ROOT)
        )
        blocked = searches.filter(
            F.col("html").contains(worldgen.ANTI_BOT_TEXT) & (F.col("attempt") == 0)
        )
        retries = self._child(
            blocked,
            url=F.col("url"),
            stage=STAGE_ROOT,
            page_no=0,
            link_idx=-1,
            attempt=F.col("attempt") + 1,
        ).withColumn(
            "crawl_delay",
            F.col("crawl_delay") + F.lit(worldgen.BACKOFF["tianyan"]),
        ).withColumn("depth", F.col("depth") - 1)
        ok = searches.filter(~F.col("html").contains(worldgen.ANTI_BOT_TEXT))
        if self.cfg.html_parser == "dialect":
            # clean dialect markup: JVM regexp, no Arrow crossing
            first_link = F.regexp_extract(
                F.col("html"), r'<a class="query_name" href="([^"]*)"', 1
            )
        else:
            first_link = self.U["first_query_link"]("html")
        details = ok.withColumn("href", first_link).filter(F.col("href") != "")  # F13
        children = self._child(
            details,
            url=absolutize_col(F.col("href"), F.lit(TYC_BASE)),
            stage=STAGE_CHILD,
            page_no=0,
            link_idx=0,
        )
        return children, retries

    # ----------------------------------------------------------- extraction

    def _extract_weixin_articles(self, fetched: DataFrame) -> tuple[DataFrame, DataFrame]:
        """D2-D7 + F8-F11 + K1 analog: article pages -> 13-column
        articles table (tb_news_resource shape,
        weixin_public.py:245-248) + image rows for the pipeline."""
        arts = fetched.filter(
            (F.col("source") == "weixin") & (F.col("stage") == STAGE_CHILD)
        )
        parsed = arts.withColumn("p", self.U["parse_article"]("html"))
        kept = (
            parsed.filter(F.col("p.body_html").isNotNull())  # F8
            .filter(~F.col("p.has_video"))  # F9
            .filter(F.col("p.publish_time").isNotNull())  # F10
            .filter(
                ~(
                    F.col("p.body_text").contains("课程详情")
                    & F.col("p.body_text").contains("报名需知")
                )
            )  # F11
        )
        # D7 images parsed pre-trim (reference processes imgs first,
        # weixin_public.py:350-373, then trims, then tiny)
        imgs = kept.select(
            "url",
            "line_no", "page_no", "link_idx",
            F.col("title").alias("caption"),
            F.explode(self.U["parse_images"](F.col("p.body_html"))).alias("img"),
        ).select(
            F.col("url").alias("article_url"),
            "line_no", "page_no", "link_idx",
            "caption",
            F.col("img.src").alias("src"),
            F.col("img.data_type").alias("data_type"),
        )
        # D6 trim (data-driven rules) then D5 tiny
        trims = gating.trim_rules_map(self.rules)
        kept = kept.join(
            F.broadcast(trims), kept["name"] == trims["trim_key"], "left"
        )
        content = self.U["tiny_html"](
            self.U["trim_dom"](
                F.col("p.body_html"),
                F.coalesce(F.col("trim_marker"), F.lit("")),
                F.coalesce(F.col("trim_direction"), F.lit("strip_after")),
            )
        )
        articles = kept.select(
            F.col("url").alias("src_url"),
            "title",
            F.col("p.author_name").alias("author_name"),
            F.col("name").alias("resource_from"),
            content.alias("content"),
            F.col("p.msg_link").alias("content_src"),
            F.lit(0).alias("content_read"),
            F.lit(0).alias("audit_status"),
            F.col("p.publish_time").alias("publish_time"),
            F.lit(self.cfg.fixed_date).alias("create_time"),  # X10 fixed clock
            "summary",
            F.lit("").alias("src_header"),
            F.col("cover").alias("cover_small"),
            "seed_id", "line_no", "page_no", "link_idx",
        )
        return articles, imgs

    def _extract_csm_articles(self, fetched: DataFrame) -> DataFrame:
        """D2+D4+K4 analog: body text per article."""
        arts = fetched.filter(
            (F.col("source") == "chuansongmen") & (F.col("stage") == STAGE_CHILD)
        )
        return arts.select(
            F.col("url").alias("src_url"),
            F.col("name").alias("account"),
            "seed_id", "line_no", "page_no", "link_idx",
            self.U["csm_body_text"]("html").alias("text"),
        )

    def _extract_companies(self, fetched: DataFrame) -> DataFrame:
        """D10-D15 + K2 analog: detail pages -> nested company rows."""
        details = fetched.filter(
            (F.col("source") == "tianyan") & (F.col("stage") == STAGE_CHILD)
        )
        parsed = details.withColumn("c", self.U["parse_company"]("html"))
        return parsed.select(
            F.regexp_extract("url", r"/company/(\d+)", 1).alias("company_id"),
            F.lit("tianyancha").alias("sourceFrom"),
            F.lit(self.cfg.fixed_date).alias("last_update"),
            "seed_id", "line_no",
            "c.*",
        )

    def _image_pipeline(self, imgs: DataFrame) -> DataFrame:
        """F15 sig gate -> X3 fmt -> URL dedupe (download cache) ->
        synth fetch + decode -> F16 small -> X7/X8 rehost id ->
        images corpus rows (input_hint schema + lineage columns)."""
        imgs = imgs.withColumn("sig", pic_signature_col(F.col("src")))  # X2
        imgs = gating.pic_sig_gate(imgs, self.rules, "sig")  # F15
        fmt = F.when(F.col("data_type") != "", F.col("data_type")).otherwise(
            query_param_col(F.col("src"), "wx_fmt", "jpg")  # X3
        )
        imgs = imgs.withColumn("fmt", fmt)
        imgs = batch_first_occurrence(  # download cache: dedupe by URL,
            # first occurrence in article-priority order (matches the
            # sequential reference encounter order)
            imgs.withColumn("_k", F.col("src")),
            "_k",
            ["line_no", "page_no", "link_idx"],
            order_col=pack_order(
                [(F.col("line_no"), 30, "line_no"),
                 (F.col("page_no"), 12, "page_no"),
                 (F.col("link_idx"), 10, "link_idx")]
            ),
        ).drop("_k")
        imgs = fetch_and_decode_images(imgs, "src")
        imgs = with_rehost_id(imgs, "src")
        return imgs.select(
            "image_id",
            "bytes",
            F.col("w").cast("int").alias("w"),
            F.col("h").cast("int").alias("h"),
            "fmt",
            "caption",
            "phash",
            "small",
            "sig",
            F.col("src").alias("src_url"),
            "article_url",
            "rehost_url",
            "dec_fmt",
            F.length("bytes").alias("n_bytes"),
        )

    # -------------------------------------------------------------- rounds

    def run_round(self, frontier: DataFrame) -> DataFrame:
        """One scheduling round; returns next round's frontier."""
        cfg = self.cfg
        cand = self._enrich(frontier)
        cand = gating.robots_gate(cand, self.rules)  # J8
        cand = batch_first_occurrence(  # J6 step 1: first-occurrence-wins
            cand,
            "key_hash",
            ["source"] + PRIORITY_COLS[1:],
            order_col=packed_dedup_order_col(sorted(SOURCE_RANK)),
        )
        if self.filter_family == "cuckoo" and self.filters is not None:  # J1
            from ..operators.cuckoo import dedup_against_seen_cuckoo

            new = dedup_against_seen_cuckoo(cand, self.seen, self.filters)
        elif self.filter_family == "bloom" and self.filters is not None:
            new = dedup_against_seen(cand, self.seen, self.filters)
        else:
            new = dedup_against_seen(cand, self.seen, None)
        # Materialize the round's survivor set ONCE before schedule():
        # its bounds job, its offsets job, and the fetch materialization
        # each execute the plan they are given, so an unmaterialized
        # enrich -> robots -> dedup chain would run ~3x per round
        # (correct either way since round 5 — the bucket is a pure row
        # function — but 3x the work; same pattern and rationale as
        # bench_frontier.timed_schedule). Blocks are freed the moment
        # `fetched` exists below.
        pre_new_ids = _persistent_rdd_ids(self.spark)
        new = new.localCheckpoint(eager=True)
        new_ckpt_ids = _persistent_rdd_ids(self.spark) - pre_new_ids
        ckpt = CheckpointHandle()
        plan = schedule(new, n_salts=cfg.n_salts, handle=ckpt)
        fetched = self._fetch(plan).localCheckpoint(eager=True)
        # Since round 4 schedule() materializes nothing (round 5: its
        # offsets and window passes agree on driver-collected literal
        # bucket bounds — pure row functions, no shared exchange or
        # determinism-on-recompute needed), so this frees zero
        # blocks — kept as the contractual release point so any future
        # scheduler materialization is freed here, by handle, the
        # moment `fetched` exists (round-2 verdict #2 / ADVICE r3 #2).
        free_schedule_checkpoints(self.spark, ckpt)
        # `new` is not referenced past `fetched`; free its blocks now
        # so per-round checkpoint memory stays O(one round).
        _unpersist_rdds(self.spark, new_ckpt_ids)

        log_cols = [
            "url", "canon_url", "dedup_key", "key_hash", "bucket", "host",
            "source", "name", "seed_id", "line_no", "stage", "page_no",
            "link_idx", "attempt", "depth", "crawl_delay", "kind",
            "render", "ua_id", "proxy_id",
            "host_salt", "host_rank", "host_scheduled_at",
        ]
        log = fetched.select(*log_cols).withColumn("round", F.lit(self.round))
        self.fetch_log = log if self.fetch_log is None else self.fetch_log.unionByName(log)

        seen_new = fetched.select(
            "bucket", "key_hash", "dedup_key", "url"
        ).withColumn("round", F.lit(self.round))
        self.seen = self.seen.unionByName(seen_new).localCheckpoint(eager=True)
        self._update_filters(seen_new)

        # extraction
        wx_articles, wx_imgs = self._extract_weixin_articles(fetched)
        csm_articles = self._extract_csm_articles(fetched)
        companies = self._extract_companies(fetched)
        images = self._image_pipeline(wx_imgs)
        self.articles = _acc(self.articles, wx_articles)
        self.articles_text = _acc(self.articles_text, csm_articles)
        self.companies = _acc(self.companies, companies)
        self.images = _acc(self.images, images)

        # expansion -> next frontier
        children, retries = self._expand_tianyan_search(fetched)
        nxt = (
            self._expand_weixin_list(fetched)
            .unionByName(self._expand_csm_account(fetched))
            .unionByName(self._expand_csm_list(fetched))
            .unionByName(children)
            .unionByName(retries)
        )
        return nxt.localCheckpoint(eager=True)

    # ------------------------------------------------------------- filters

    def _build_filters(self, seen: DataFrame) -> DataFrame:
        if self.filter_family == "cuckoo":
            from ..operators.cuckoo import build_cuckoo_filters

            return build_cuckoo_filters(seen)
        return build_bloom_filters(seen)

    def _update_filters(self, seen_new: DataFrame) -> None:
        """Incremental per-round prefilter maintenance: rebuild ONLY
        the hash buckets this round's fetches touched; filter rows for
        untouched buckets are CARRIED byte-identically from the
        previous round (tested). At 10^10-URL scale a round touches a
        small fraction of buckets — a full rebuild per round would
        rescan the entire seen table (O(seen) per round, O(rounds x
        seen) total); this is O(seen-in-dirty-buckets).

        The dirty-bucket list crosses the driver but is bounded by
        n_buckets (a table-layout constant, not data volume)."""
        if self.filter_family == "none":
            return
        dirty = [int(r["bucket"]) for r in seen_new.select("bucket").distinct().collect()]
        if not dirty:
            return
        rebuilt = self._build_filters(
            self.seen.filter(F.col("bucket").isin(dirty))
        )
        if self.filters is None:
            merged = rebuilt
        else:
            merged = self.filters.filter(~F.col("bucket").isin(dirty)).unionByName(
                rebuilt
            )
        # checkpoint the merged table (truncates the carry chain) and
        # free the previous round's filter blocks deterministically
        pre = _persistent_rdd_ids(self.spark)
        self.filters = merged.localCheckpoint(eager=True)
        new_ids = _persistent_rdd_ids(self.spark) - pre
        _unpersist_rdds(self.spark, self._filter_ckpt_ids)
        self._filter_ckpt_ids = new_ids

    def run(self) -> dict[str, DataFrame]:
        frontier = self.initial_frontier()
        while self.round < self.cfg.max_rounds:
            n = frontier.count()
            if n == 0:
                break
            frontier = self.run_round(frontier)
            self.metrics.append({"round": self.round, "frontier_in": n})
            if self.store is not None:
                self._snapshot(frontier)
            self.round += 1
        return self.results()

    def _snapshot(self, next_frontier: DataFrame) -> None:
        """K6/O10-O11: commit this round's state for resume."""
        tables = {"frontier_next": next_frontier, "seen": self.seen}
        for name in ("fetch_log", "articles", "articles_text", "companies", "images"):
            df = getattr(self, name)
            if df is not None:
                tables[name] = df
        self.store.write_round(self.round, tables, {"metrics": self.metrics[-1]})

    @classmethod
    def resume(
        cls,
        spark: SparkSession,
        store: SnapshotStore,
        config: CrawlConfig | None = None,
    ) -> "CrawlRun":
        """Resume from the latest committed snapshot (O11): identical
        final state to an uninterrupted run (tested)."""
        run = cls(spark, config, store)
        last = store.latest_round()
        if last is None:
            return run
        store.verify_round(spark, last)  # per-partition lineage gate
        run.round = last + 1
        run.seen = store.read(spark, last, "seen").localCheckpoint(eager=True)
        # rebuild the prefilter from the restored seen set (every
        # bucket present is 'dirty' on resume — full rebuild once,
        # then incremental again per round)
        run._update_filters(run.seen)
        for name in ("fetch_log", "articles", "articles_text", "companies", "images"):
            try:
                setattr(run, name, store.read(spark, last, name))
            except Exception:
                setattr(run, name, None)
        run._resume_frontier = store.read(spark, last, "frontier_next").localCheckpoint(
            eager=True
        )
        return run

    def run_resumed(self) -> dict[str, DataFrame]:
        frontier = getattr(self, "_resume_frontier", None)
        if frontier is None:
            return self.run()
        while self.round < self.cfg.max_rounds:
            n = frontier.count()
            if n == 0:
                break
            frontier = self.run_round(frontier)
            self.metrics.append({"round": self.round, "frontier_in": n})
            if self.store is not None:
                self._snapshot(frontier)
            self.round += 1
        return self.results()

    # -------------------------------------------------------------- results

    def fetch_order(self, handle: CheckpointHandle | None = None) -> DataFrame:
        """The replay artifact: every fetch with its global per-source
        sequence + virtual clock, reconstructed by SORT over the
        priority tuple (O4) — never by task timing.

        Lifecycle note: each call localCheckpoints the range-partitioned
        fetch log internally. Looping callers should pass a
        ``CheckpointHandle`` and, after materializing the returned plan,
        call ``free_schedule_checkpoints(spark, handle)`` to free
        exactly this call's blocks (the ContextCleaner frees them on GC
        otherwise). Without a handle the blocks land in the scheduler's
        module-global fallback registry, which a handle-less free from
        ANY caller drains — unsafe when run_round and a held
        fetch_order plan overlap (ADVICE r3 #2)."""
        return schedule(
            self.fetch_log, n_salts=self.cfg.n_salts, handle=handle
        ).orderBy("source_rank", "ref_seq")

    def results(self) -> dict[str, DataFrame]:
        return {
            "fetch_log": self.fetch_log,
            "fetch_order": self.fetch_order() if self.fetch_log is not None else None,
            "seen": self.seen,
            "articles": self.articles,
            "articles_text": self.articles_text,
            "companies": self.companies,
            "images": self.images,
        }


def _acc(acc: DataFrame | None, new: DataFrame) -> DataFrame:
    new = new.localCheckpoint(eager=True)
    return new if acc is None else acc.unionByName(new)

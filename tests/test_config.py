"""S4 INI profile loader (reference: weixin_public.py:25-52)."""

from __future__ import annotations

import pytest

from python_crawler_spark.config import load_profile

from pathlib import Path

INI = str(Path(__file__).resolve().parent.parent / "config" / "crawl.ini")


def test_section_selection():
    online = load_profile(INI, "weixin_online")
    local = load_profile(INI, "weixin_local")
    assert online.articles_sink.kind == "jdbc"
    assert online.articles_sink.table == "tb_news_resource"
    assert online.articles_sink.url == "jdbc:mysql://db.online.example.invalid:3306/news_cms"
    assert local.articles_sink.url.startswith("jdbc:mysql://localhost:")
    assert online.tfs_get != local.tfs_get
    assert online.articles_sink.options["characterEncoding"] == "utf8mb4"


def test_missing_section_and_file():
    with pytest.raises(KeyError):
        load_profile(INI, "nope")
    with pytest.raises(FileNotFoundError):
        load_profile("/does/not/exist.ini", "weixin_online")

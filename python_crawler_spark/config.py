"""S4: INI config scan — section-keyed environment profiles.

The reference selects a hardcoded section name from an INI file and
reads connection + path parameters from it (weixin_public.py:25-52 over
config.txt's online / pre_release / local sections). This is a
driver-side concern, not a dataflow op (SURVEY §2.1 S4), so the analog
is a typed profile loader whose outputs plug into the existing seams:
the MySQL fields become a ``sinks.SinkTarget('jdbc', ...)``, the
TFS/pic fields become image-sink parameters, and the seed path feeds
the seed scan (S1).

Profiles here carry synthetic endpoints only; production points the
same keys at real services.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass
from pathlib import Path

from .sinks import SinkTarget


@dataclass(frozen=True)
class CrawlProfile:
    """One [section] of the INI, typed."""

    section: str
    articles_sink: SinkTarget       # MySQL tb_news_resource analog (K1)
    pic_dir: str                    # image staging dir
    seed_path: str                  # S1 seed list location
    tfs_post: str                   # image re-host endpoint (K5)
    tfs_get: str                    # re-hosted image URL base (X8)


def load_profile(path: str | Path, section: str) -> CrawlProfile:
    """Read one section (reference: config.get(section, key),
    weixin_public.py:42-52). Raises on missing section/keys, like the
    reference's ConfigParser would."""
    cp = configparser.RawConfigParser()
    read = cp.read(str(path))
    if not read:
        raise FileNotFoundError(path)
    if not cp.has_section(section):
        raise KeyError(f"no section [{section}] in {path}")
    host = cp.get(section, "host")
    port = cp.getint(section, "port")
    db = cp.get(section, "db")
    sink = SinkTarget(
        kind="jdbc",
        url=f"jdbc:mysql://{host}:{port}/{db}",
        table="tb_news_resource",
        options={
            "user": cp.get(section, "user"),
            "password": cp.get(section, "passwd"),
            "characterEncoding": "utf8mb4",  # SET NAMES utf8mb4 analog
        },
    )
    return CrawlProfile(
        section=section,
        articles_sink=sink,
        pic_dir=cp.get(section, "pic_dir"),
        seed_path=cp.get(section, "public_name_path"),
        tfs_post=cp.get(section, "tfs_post"),
        tfs_get=cp.get(section, "tfs_get"),
    )

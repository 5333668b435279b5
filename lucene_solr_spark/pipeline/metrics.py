"""Truncation counters for bounded driver-side collects.

The brief's "no silent caps" rule: any operator that bounds its coverage
(top-N vocab, sampled training set, capped manifest) must say what the
cap cut. `_capped_bucket_pairs` (dedup.py) surfaces capped buckets as a
DataFrame; for the driver-side collects (PQ codebook sample, BPE vocab,
shard-packing offsets) the natural surface is a counter: each site calls
``record_cap(site, kept, dropped)`` which logs at INFO and stores the
last observation in ``CAP_METRICS`` so a pipeline run (or a test) can
inspect exactly what was dropped.
"""

from __future__ import annotations

import logging

LOG = logging.getLogger("lucene_solr_spark.caps")

# site -> {"kept": int, "dropped": int, ...extra}; last observation wins.
CAP_METRICS: dict[str, dict] = {}


def record_cap(site: str, kept: int, dropped: int, **extra) -> dict:
    """Record that a bounded collect kept `kept` items and dropped
    `dropped` beyond its cap. Always logs (INFO when dropped == 0,
    WARNING when the cap actually cut something) and returns the entry."""
    entry = {"kept": int(kept), "dropped": int(dropped)}
    entry.update(extra)
    CAP_METRICS[site] = entry
    lvl = logging.WARNING if dropped else logging.INFO
    LOG.log(lvl, "cap[%s]: kept=%d dropped=%d %s", site, kept, dropped, extra)
    return entry

"""Live-index search-template config — the ``update-templates-only``
analogue (``MainClass.java:50-63``: store this build's search templates in
Elasticsearch and exit, "updates the queries of a live index without a
reindex"; the templates themselves are ``SearchTemplates.java`` /
``points_search.json``).

The reference's templates parametrize the QUERY side only — field boosts,
constant-score tiers, function_score weights and decay shape
(``points_search.json:16-27,70-90,131-158``) — never the index layout, so
swapping them on a live index is sound. Here those tunables live in one
JSON document at the INDEX ROOT (``<out_dir>/search_config.json``), read
by the serving reader at open; ``update_templates()`` rewrites it
atomically under the same writer lock that serializes live.json publishes,
so a template push and a segment publish can never interleave into a torn
read. Absent file == code defaults, so existing indexes and every oracle
query are unchanged.

At 100 TB this is exactly the production shape: query-tuning experiments
(reweighting boosts, tier constants, recency shape) roll out by pushing a
tiny config to the serving fleet — no touch of the petabyte postings.
"""
from __future__ import annotations

import json
import os
import time

from .. import scoring as S
from ..indexing.build import FIELD_BOOSTS

#: every template-tunable the serving pipeline consults, with the frozen
#: reference-cited defaults (boost/tier/weight citations at each constant's
#: definition site: indexing/build.py:77, scoring.py:48-60,
#: queries/logical.py — points_search.json:16-27,70-90,131-158)
DEFAULTS: dict = {
    "config_version": 1,
    "field_boosts": dict(FIELD_BOOSTS),   # text x5 / meta x3
    "tier_exact": 12.0,                   # constant_score exact keyword
    "tier_phrase": 6.0,                   # constant_score contained phrase
    "w_text": S.W_TEXT,                   # saturation numerator (4*s/(s+8))
    "k_text": S.K_TEXT,                   # saturation pivot
    "w_prior": S.W_PRIOR,                 # field_value_factor 0.3
    "w_exact": S.W_EXACT,                 # exact-name weight +0.8
    "w_rec": S.W_REC,                     # gaussian recency weight
    "rec_offset": S.REC_OFFSET,           # decay offset (0.5 km analogue)
    "rec_scale": S.REC_SCALE,             # 30-day gaussian scale
}

_FILE = "search_config.json"


def _validate_boosts(boosts: dict):
    """field_boosts overrides must be TOTAL: the serving scorer looks up
    boosts[field] for every indexed field, so a partial dict (e.g. only
    'text') would KeyError at query time and brick live serving until the
    config is fixed (round-6 ADVICE, medium)."""
    bad = set(boosts) - set(FIELD_BOOSTS)
    if bad:
        raise ValueError(f"unknown fields in field_boosts: {sorted(bad)}")
    missing = set(FIELD_BOOSTS) - set(boosts)
    if missing:
        raise ValueError(
            f"field_boosts must cover every field; missing: {sorted(missing)}")


def load_config(out_dir: str) -> dict:
    """DEFAULTS overlaid with ``<out_dir>/search_config.json`` when
    present. Unknown keys in the file are rejected loudly (a typo'd
    template push must not silently no-op); a partial field_boosts doc is
    rejected too (it would KeyError on the serving path). Nested values
    are deep-copied so callers can never mutate module-level DEFAULTS
    through a loaded config (round-6 ADVICE, low)."""
    cfg = json.loads(json.dumps(DEFAULTS))
    path = os.path.join(out_dir, _FILE)
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
        doc.pop("updated_at", None)
        unknown = set(doc) - set(DEFAULTS)
        if unknown:
            raise ValueError(f"unknown search_config keys: {sorted(unknown)}")
        if "field_boosts" in doc:
            _validate_boosts(doc["field_boosts"])
        cfg.update(doc)
    return cfg


def update_templates(out_dir: str, overrides: dict) -> dict:
    """Persist this build's template config (defaults + ``overrides``)
    into a live index WITHOUT touching any segment — the
    ``update-templates-only`` branch. Validates keys against DEFAULTS,
    writes atomically (tmp + rename) under the live.json writer lock, and
    returns the full effective config. New ``LocalSearcher`` opens (and
    daemon restarts) pick it up; running readers keep their snapshot —
    the same rollout semantics as re-registering an ES search template."""
    from ..indexing.build import _live_lock
    unknown = set(overrides) - set(DEFAULTS)
    if unknown:
        raise ValueError(f"unknown search_config keys: {sorted(unknown)}")
    if "field_boosts" in overrides:
        _validate_boosts(overrides["field_boosts"])
    cfg = json.loads(json.dumps(DEFAULTS))
    cfg.update(overrides)
    doc = dict(cfg)
    doc["updated_at"] = time.time()
    path = os.path.join(out_dir, _FILE)
    with _live_lock(out_dir):
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1)
        os.replace(tmp, path)
    return cfg

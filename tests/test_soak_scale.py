"""Route-equality regression tests for the two scale fallbacks, sharing
the soak tool's machinery (tools/soak_scale_paths.py). The default run
uses forcing-but-fast sizes; set ``SOAK=1`` to run the full >=60M-entry
/ >=10M-bigram soak inside pytest (minutes). The full-scale record
lives in BASELINE.md (round 4).
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

FULL = os.environ.get("SOAK") == "1"


def test_lm_merge_routes_bitwise(ray_session):
    from soak_scale_paths import soak_lm_merge

    if FULL:
        res = soak_lm_merge()
    else:
        res = soak_lm_merge(n_docs=200, doc_len=3000, vocab=300,
                            min_bigrams=10_000)
    assert res["sharded"]["path_fired"] == "sharded"
    assert res["tree"]["path_fired"] == "tree"
    assert res["match"], json.dumps(res)


def test_component_assignment_routes_hash_equal(ray_session):
    from soak_scale_paths import soak_components

    if FULL:
        res = soak_components()
    else:
        res = soak_components(n_map=150_000, n_ids=300_000)
    assert res["broadcast"]["rows"] == res["n_ids"]
    assert res["match"], json.dumps(res)

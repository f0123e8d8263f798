"""USAGE.md is executable documentation: every plain ```python block
runs top-to-bottom in ONE namespace against the shared Spark session,
so the quickstart cannot drift from the API (VERDICT r4 next-round #8).
Blocks fenced as ```python notest (the streaming sketch, which needs an
external checkpoint dir/source) are skipped by the extractor."""

import os
import re

USAGE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "USAGE.md")


def _blocks():
    text = open(USAGE).read()
    out = []
    for m in re.finditer(r"^```python([^\n]*)\n(.*?)^```", text,
                         re.S | re.M):
        tag, body = m.group(1).strip(), m.group(2)
        if tag == "":
            out.append(body)
    return out


def test_usage_snippets_execute(spark):
    blocks = _blocks()
    assert len(blocks) >= 10, "USAGE.md lost its runnable snippets"
    ns = {"spark": spark}
    for i, code in enumerate(blocks):
        try:
            exec(compile(code, f"USAGE.md[block {i}]", "exec"), ns)
        except Exception as exc:  # pragma: no cover
            raise AssertionError(
                f"USAGE.md block {i} failed: {exc}\n---\n{code}") from exc


def test_usage_mentions_every_family():
    text = open(USAGE).read()
    for needle in ("denormalize", "point_in_polygon", "knn",
                   "tile_assignment", "attach_s2", "exact_dedup",
                   "minhash_lsh_pairs", "ann_brute_force",
                   "embedding_near_dup_pairs", "token_counts",
                   "phash_images", "streaming_first_seen",
                   "CheckpointRunner"):
        assert needle in text, f"USAGE.md lost the {needle} recipe"

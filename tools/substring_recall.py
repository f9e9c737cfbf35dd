"""Substring-dedup RECALL experiment: planted duplicated spans.

VERDICT r6 #5: span_dedup (fixed windows) and cdc_chunk_dedup (content-
defined boundaries) both approximate exact-substring dedup (the
suffix-array pass of Lee et al.'s "Deduplicating Training Data Makes
Language Models Better"); their documented blind spots are (a) fixed
windows miss any duplicate whose shift ≢ 0 (mod stride) and (b) CDC
misses spans shorter than ~one chunk plus the boundary-straddling
first/last chunks. This experiment MEASURES those gaps instead of
asserting them:

- A synthetic corpus of fully-random-token docs (seeded; random chunks
  are unique with overwhelming probability, so every duplicate chunk
  found is a planted one).
- For each span length L, N source→target pairs: the same L-token span
  is embedded at an INDEPENDENT random offset in each doc of the pair
  (arbitrary relative shift — the adversarial case for fixed windows).
- Detection = the TARGET doc (larger doc_id) has at least one non-first-
  occurrence chunk. Token recall (CDC) = duplicate-marked tokens / L.

Usage: python tools/substring_recall.py
Writes one JSON line; human detail on stderr. Results recorded in
SCALING.md ("Substring-dedup recall — measured").
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPAN_LENGTHS = [4, 8, 12, 16, 24, 32, 48, 64]
PLANTS_PER_L = 40
FILLER = 50  # filler tokens on each side (expected), doc ≈ 100 + L tokens
SEED = 20260814


def build_corpus(rng: random.Random):
    """[(doc_id, text)] — doc 2i = source, doc 2i+1 = target of plant i;
    plants for all span lengths live in ONE corpus so each operator runs
    once. Returns (rows, {target_id: L})."""

    def words(n):
        return [
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))
            for _ in range(n)
        ]

    rows, target_len = [], {}
    did = 0
    for L in SPAN_LENGTHS:
        for _ in range(PLANTS_PER_L):
            span = words(L)
            for is_target in (0, 1):
                left = words(rng.randint(0, FILLER))
                right = words(FILLER * 2 - len(left))
                rows.append((did, " ".join(left + span + right)))
                if is_target:
                    target_len[did] = L
                did += 1
    return rows, target_len


def main() -> None:
    from pyspark.sql import functions as F

    from pypeln_spark.ext import dedup as D
    from pypeln_spark.session import get_spark

    rng = random.Random(SEED)
    rows, target_len = build_corpus(rng)
    spark = get_spark(app_name="pypeln_substring_recall")
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    arms = {
        "span_w16_s16": lambda: D.span_dedup(docs, window=16),
        "span_w16_s8": lambda: D.span_dedup(docs, window=16, stride=8),
        "span_w16_s4": lambda: D.span_dedup(docs, window=16, stride=4),
        "cdc_d8": lambda: D.cdc_chunk_dedup(docs, divisor=8),
    }
    results = {}
    for arm, fn in arms.items():
        out = {r["doc_id"]: r.asDict() for r in fn().collect()}
        per_l = {}
        for did, L in target_len.items():
            r = out[did]
            dup_chunks = r["n_chunks"] - r["n_kept"]
            stats = per_l.setdefault(L, {"n": 0, "hit": 0, "dup_tokens": 0})
            stats["n"] += 1
            stats["hit"] += int(dup_chunks > 0)
            if "n_tokens" in r:  # CDC: token-weighted accounting
                kept_tokens = round(r["kept_token_frac"] * r["n_tokens"])
                stats["dup_tokens"] += r["n_tokens"] - kept_tokens
        results[arm] = {
            str(L): {
                "detect_rate": round(s["hit"] / s["n"], 3),
                "token_recall": (
                    round(s["dup_tokens"] / (s["n"] * L), 3)
                    if s["dup_tokens"]
                    else None
                ),
            }
            for L, s in sorted(per_l.items())
        }
        print(f"# {arm}: {results[arm]}", file=sys.stderr)

    print(json.dumps({"seed": SEED, "plants_per_l": PLANTS_PER_L, "arms": results}))
    spark.stop()


if __name__ == "__main__":
    main()

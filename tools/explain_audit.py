"""Physical-plan audit: dump `.explain('formatted')` for the headline
queries at sf0.1 and grep the properties that matter at 100 TB —
parquet pushdown (PushedFilters / ReadSchema pruning), broadcast hash
joins on dims, whole-stage codegen coverage, and absence of
row-at-a-time Python UDFs. Writes BENCH/PLANS.md.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = [
    "q1_pricing_summary",
    "star_join_revenue",
    "fact_build_star",
    "price_banding",
    "max_lsn_dedup",
    "exact_dedup_docs",
    "minhash_lsh_pairs",
    "embedding_cosine_topk",
    "topk_orders_per_segment",
    "path_normalize_synthetic",
    "text_signals_docs",
    "token_budget_sample",
    "tfidf_top_terms",
    "ua_enrich_traffic",
    "ref_region_traffic",
    "semi_join_discounted_orders",
    "sessionize_events",
    "paragraph_dedup_docs",
    "range_frame_weekly_revenue",
    "unpivot_charge_components",
]


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from w3_data_etl_pipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("explain_audit", master="local[8]", shuffle_partitions=8)
    qs = entrymod.queries()
    out = ["# BENCH/PLANS.md — physical-plan audit (sf0.1)", ""]
    summary = []
    for name in AUDIT:
        df = qs[name](spark, sf_dir)
        p = plan_text(df)
        n_codegen = p.count("WholeStageCodegen")
        n_bhj = p.count("BroadcastHashJoin")
        n_smj = p.count("SortMergeJoin")
        n_exch = p.count("Exchange")
        pushed = "PushedFilters: [" in p and "PushedFilters: []" not in p
        n_pyudf = p.count("BatchEvalPython")
        n_arrow = p.count("ArrowEvalPython")
        summary.append(
            f"| {name} | {n_exch} | {n_bhj} | {n_smj} | {n_codegen} | "
            f"{'yes' if pushed else '-'} | {n_pyudf} | {n_arrow} |"
        )
        out += [f"## {name}", "", "```", p.strip(), "```", ""]
    hdr = [
        "| query | exchanges | broadcast joins | sortmerge joins | codegen spans | pushed filters | row-Python UDFs | Arrow UDFs |",
        "|---|---|---|---|---|---|---|---|",
    ]
    doc = out[:2] + hdr + summary + [""] + out[2:]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "PLANS.md")
    # preserve hand-written audit sections: everything from the marker
    # on survives regeneration verbatim
    marker = "<!-- MANUAL AUDITS (kept by tools/explain_audit.py) -->"
    manual = ""
    if os.path.exists(path):
        prev = open(path).read()
        if marker in prev:
            manual = prev[prev.index(marker):]
    with open(path, "w") as f:
        f.write("\n".join(doc))
        if manual:
            f.write("\n" + manual)
    print("\n".join(hdr + summary))
    print(f"\nwrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

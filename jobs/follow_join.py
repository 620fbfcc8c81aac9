"""spark-submit entrypoint for an incrementally-maintained JOIN view:
keep a materialized bucketed join of two LakeTables fresh from both
change feeds, exactly-once (streaming/joinview.py). Fourth leg of the
deployment set — run_cdc.py ingests, maintain.py operates,
follow_cdf.py derives one-table views, follow_join.py derives joins:

    tools/submit.sh --master local[8] -- \
        jobs/follow_join.py --left /data/lake/repos \
        --right /data/lake/repo_meta --view /data/lake/repos_enriched \
        --on repo:repo,path:path --drain

The view's own snapshot props are the offset store (cursors commit
atomically with each sync's merge), so there is no checkpoint
argument: kill the job anywhere and rerun the same command line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from w3_data_etl_pipeline_spark.plans.laketable import LakeTable
from w3_data_etl_pipeline_spark.session import get_spark
from w3_data_etl_pipeline_spark.streaming.joinview import (
    create_join_view,
    follow_join_view,
    view_state,
)


def _pairs(raw: str | None):
    if not raw:
        return None
    out = []
    for item in raw.split(","):
        a, _, b = item.strip().partition(":")
        out.append((a.strip(), (b or a).strip()))
    return out


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="LakeTable join-view maintainer")
    p.add_argument("--left", required=True, help="left LakeTable root")
    p.add_argument("--right", required=True, help="right LakeTable root")
    p.add_argument("--view", required=True, help="view LakeTable root "
                   "(created if absent, at the coarser bucket count)")
    p.add_argument("--on", help="join pairs lcol[:rcol],... "
                   "(default: positional bucket-key pairing)")
    p.add_argument("--how", default="inner",
                   choices=["inner", "left", "right", "full", "semi", "anti"])
    p.add_argument("--select", nargs="*", help="output columns to keep "
                   "(must include the view keys; default: all)")
    p.add_argument("--poll-interval", type=float, default=2.0)
    p.add_argument("--max-polls", type=int, default=None)
    p.add_argument("--drain", action="store_true",
                   help="stop when caught up with both sources")
    args = p.parse_args(argv)

    spark = get_spark("follow-join")
    left = LakeTable(spark, args.left)
    right = LakeTable(spark, args.right)
    on = _pairs(args.on)
    if os.path.isdir(os.path.join(args.view, "_meta")):
        view = LakeTable(spark, args.view)
    else:
        view = create_join_view(
            left, right, args.view, how=args.how, on=on, select=args.select
        )
    out = follow_join_view(
        left,
        right,
        view,
        how=args.how,
        on=on,
        select=args.select,
        poll_interval=args.poll_interval,
        max_polls=args.max_polls,
        stop_when_caught_up=args.drain,
    )
    print(json.dumps({**out, "state": view_state(view)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

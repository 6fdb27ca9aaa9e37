"""CLI query surface over an exported serving artifact.

    # export during training (best sweep combo, best-valid state):
    python -m recommendar_systems_tpu.main -m LightGCN -d synthetic \
        --config export_dir=/tmp/lgn_serve export_int8=false

    # query it:
    python -m recommendar_systems_tpu.serve -a /tmp/lgn_serve -u 0,5,12 -k 10
    python -m recommendar_systems_tpu.serve -a /tmp/lgn_serve --history 3,17,42 -k 10
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description="Query a serving artifact")
    p.add_argument("-a", "--artifact", required=True, help="export_dir path")
    p.add_argument("-u", "--users", default=None,
                   help="comma-separated user ids")
    p.add_argument("--history", default=None,
                   help="comma-separated item ids (cold-start fold-in)")
    p.add_argument("-k", type=int, default=20)
    p.add_argument("--include-seen", action="store_true")
    p.add_argument("--device", default=None, choices=[None, "cpu"],
                   help="force the host platform")
    args = p.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from recommendar_systems_tpu.serve import ServingEngine

    eng = ServingEngine.load(args.artifact)
    out = {"model": eng.meta.get("model"), "dataset": eng.meta.get("dataset")}
    if args.users:
        ids = [int(x) for x in args.users.split(",") if x != ""]
        items, scores = eng.topk(ids, k=args.k,
                                 exclude_seen=not args.include_seen)
        out["results"] = [
            {"user": u, "items": items[r].tolist(),
             "scores": np.round(scores[r], 4).tolist()}
            for r, u in enumerate(ids)
        ]
    elif args.history:
        hist = [int(x) for x in args.history.split(",") if x != ""]
        items, scores = eng.topk_for_history([hist], k=args.k)
        out["results"] = [{"history": hist, "items": items[0].tolist(),
                           "scores": np.round(scores[0], 4).tolist()}]
    else:
        p.error("need --users or --history")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

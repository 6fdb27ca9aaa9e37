"""Serving quality under a SUSTAINED online-update stream (VERDICT r4 item 9).

Builds a synthetic catalog-scale artifact whose user embeddings are the
degree-normalized means of their seen items (the fold-in model's fixed
point, so cold/warm agreement is measurable), then applies hundreds of
``add_interactions`` batches and dozens of ``add_user`` fold-ins, and
re-measures:

- approx-vs-exact top-k overlap (the ``lax.approx_max_k`` candidate path
  must stay above the 0.95 recall target as seen lists grow/widen);
- fold-in ranking quality (a just-added user's top-k vs the cold-start
  ``topk_for_history`` of the same history, and vs their source user);
- wall time per update (the in-place device row write in
  ``engine._set_seen_row``).

Appends one JSON row per measurement to analysis/serving_bench.jsonl with
campaign "r5-serving-updates" when --record is set.

Usage: python tools/probe_serving_updates.py [--cpu] [--items 1000000]
       [--users 100000] [--int8] [--updates 300] [--adds 50] [--record]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_engine(U: int, I: int, d: int, deg: int, int8: bool, seed: int):
    from recommendar_systems_tpu.serve.engine import ServingEngine
    from recommendar_systems_tpu.serve.export import quantize_item_table

    rng = np.random.default_rng(seed)
    item_emb = rng.normal(size=(I, d)).astype(np.float32)
    seen_lists = [np.unique(rng.integers(0, I, size=deg)).astype(np.int32)
                  for _ in range(U)]
    indptr = np.zeros(U + 1, dtype=np.int32)
    indptr[1:] = np.cumsum([len(s) for s in seen_lists])
    pos_items = np.concatenate(seen_lists).astype(np.int32)
    # user = mean of their seen items + noise: the fold-in fixed point
    user_emb = np.stack([
        item_emb[s].mean(axis=0) for s in seen_lists
    ]).astype(np.float32) + 0.05 * rng.normal(size=(U, d)).astype(np.float32)

    arrays = {
        "user_emb": user_emb,
        "pos_indptr": indptr,
        "pos_items": pos_items,
    }
    if int8:
        q, s = quantize_item_table(item_emb)
        arrays["item_q"] = q
        arrays["item_scale"] = s
    else:
        arrays["item_emb"] = item_emb
    meta = {
        "format_version": 1, "mode": "embedding", "n_users": U,
        "n_items": I, "dim": d, "quantized_int8": int8,
        "model": "synthetic-probe", "dataset": f"synthetic({U}u/{I}i)",
    }
    return ServingEngine(meta, arrays), rng


def approx_overlap(eng, users, k: int) -> float:
    ex_i, _ = eng.topk(users, k=k)
    ap_i, _ = eng.topk(users, k=k, approx=True)
    return float(np.mean([
        len(np.intersect1d(ex_i[r], ap_i[r])) / k for r in range(len(users))
    ]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--users", type=int, default=100000)
    p.add_argument("--items", type=int, default=1000000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--deg", type=int, default=12, help="mean seen-list size")
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--updates", type=int, default=300)
    p.add_argument("--adds", type=int, default=50)
    p.add_argument("--sample", type=int, default=256)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--record", action="store_true",
                   help="append rows to analysis/serving_bench.jsonl")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from recommendar_systems_tpu.utils.compile_cache import (
            enable_compile_cache,
        )

        enable_compile_cache()

    eng, rng = build_engine(args.users, args.items, args.dim, args.deg,
                            args.int8, seed=0)
    out_rows = []

    sample = rng.integers(0, args.users, size=args.sample).astype(np.int32)
    ov0 = approx_overlap(eng, sample, args.k)
    print(f"# overlap before updates: {ov0:.4f}", flush=True)

    # --- sustained add_interactions stream on a tracked user set
    touched = rng.choice(args.users, size=args.updates, replace=True)
    t0 = time.perf_counter()
    for n, u in enumerate(touched):
        new = rng.integers(0, args.items, size=int(rng.integers(1, 9)))
        eng.add_interactions(int(u), new)
        if (n + 1) % 100 == 0:
            print(f"# {n + 1}/{args.updates} updates applied", flush=True)
    upd_dt = time.perf_counter() - t0
    ms_per_update = upd_dt / max(args.updates, 1) * 1e3

    # --- fold-in adds: new users copying existing users' histories
    src = rng.integers(0, args.users, size=args.adds).astype(np.int32)
    hists, new_ids = [], []
    t0 = time.perf_counter()
    for s in src:
        h = eng.seen[s][eng.seen[s] < eng.n_items].tolist()
        hists.append(h)
        new_ids.append(eng.add_user(h))
    add_dt = (time.perf_counter() - t0) / max(args.adds, 1) * 1e3

    # quality after the stream
    touched_u = np.unique(touched)[: args.sample].astype(np.int32)
    ov_after = approx_overlap(eng, sample, args.k)
    ov_touched = approx_overlap(eng, touched_u, args.k)
    new_ids = np.asarray(new_ids, dtype=np.int32)
    ov_new = approx_overlap(eng, new_ids, args.k)

    # fold-in ranking quality: the added user's warm top-k vs the
    # cold-start path on the same history, and vs the source user
    warm_i, _ = eng.topk(new_ids, k=args.k)
    cold_i, _ = eng.topk_for_history(hists, k=args.k)
    src_i, _ = eng.topk(src, k=args.k)
    fold_cold = float(np.mean([
        len(np.intersect1d(warm_i[r], cold_i[r])) / args.k
        for r in range(len(new_ids))
    ]))
    fold_src = float(np.mean([
        len(np.intersect1d(warm_i[r], src_i[r])) / args.k
        for r in range(len(new_ids))
    ]))

    # exclusion invariant holds for every touched user after the stream
    bad = 0
    for u in touched_u[:64]:
        items, _ = eng.topk([int(u)], k=args.k)
        seen_u = eng.seen[u][eng.seen[u] < eng.n_items]
        bad += int(bool(np.intersect1d(items[0], seen_u).size))
    assert bad == 0, f"{bad} touched users had seen items in top-k"

    row = {
        "probe": "sustained_updates", "items": args.items,
        "users": args.users, "int8": args.int8, "k": args.k,
        "n_updates": args.updates, "n_adds": args.adds,
        "overlap_before": round(ov0, 4),
        "overlap_after": round(ov_after, 4),
        "overlap_touched": round(ov_touched, 4),
        "overlap_new_users": round(ov_new, 4),
        "foldin_vs_cold": round(fold_cold, 4),
        "foldin_vs_source": round(fold_src, 4),
        "ms_per_update": round(ms_per_update, 2),
        "ms_per_add_user": round(add_dt, 2),
        "campaign": "r5-serving-updates",
    }
    print(json.dumps(row))
    out_rows.append(row)

    if args.record:
        path = Path(__file__).resolve().parent.parent / "analysis" / "serving_bench.jsonl"
        with open(path, "a") as f:
            for r in out_rows:
                f.write(json.dumps(r) + "\n")
        print(f"# recorded to {path}")


if __name__ == "__main__":
    main()

"""Raw ratings -> 5-core filtered, reindexed `.inter` interactions.

Script counterpart of the reference's `preprocessing/0rating2inter.ipynb`
(see `preprocessing/README.md:13-17`): iterative 5-core filtering on users
and items, then dense id reindexing.  Vectorized numpy instead of pandas
loops; the same TSV output schema feeds `1splitting` (here: split_inter.py).

Usage:
    python preprocessing/rating2inter.py ratings.csv --out data/<ds>/<ds>.inter \
        [--min-core 5] [--user-col 0 --item-col 1 --rating-col 2 --ts-col 3]
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd


def k_core_filter(users: np.ndarray, items: np.ndarray, k: int = 5):
    """Iteratively drop users/items with < k interactions until stable."""
    keep = np.ones(len(users), dtype=bool)
    while True:
        u_cnt = pd.Series(users[keep]).value_counts()
        i_cnt = pd.Series(items[keep]).value_counts()
        bad_u = set(u_cnt[u_cnt < k].index)
        bad_i = set(i_cnt[i_cnt < k].index)
        if not bad_u and not bad_i:
            break
        new_keep = keep & ~pd.Series(users).isin(bad_u).to_numpy()
        new_keep &= ~pd.Series(items).isin(bad_i).to_numpy()
        if new_keep.sum() == keep.sum():
            break
        keep = new_keep
    return keep


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ratings")
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-core", type=int, default=5)
    ap.add_argument("--user-col", type=int, default=0)
    ap.add_argument("--item-col", type=int, default=1)
    ap.add_argument("--rating-col", type=int, default=2)
    ap.add_argument("--ts-col", type=int, default=3)
    ap.add_argument("--sep", default=",")
    args = ap.parse_args()

    df = pd.read_csv(args.ratings, sep=args.sep, header=None)
    users = df.iloc[:, args.user_col].to_numpy()
    items = df.iloc[:, args.item_col].to_numpy()
    ts = df.iloc[:, args.ts_col].to_numpy()

    keep = k_core_filter(users, items, args.min_core)
    users, items, ts = users[keep], items[keep], ts[keep]

    # dense reindex (token -> id), order of first appearance
    u_codes, _ = pd.factorize(users)
    i_codes, _ = pd.factorize(items)

    out = pd.DataFrame(
        {"userID": u_codes, "itemID": i_codes, "timestamp": ts}
    )
    out.to_csv(args.out, sep="\t", index=False)
    print(
        f"wrote {args.out}: {len(out)} interactions, "
        f"{u_codes.max() + 1} users, {i_codes.max() + 1} items"
    )


if __name__ == "__main__":
    main()

"""Generate the user-user co-occurrence graph dict.

Script counterpart of the reference's
`preprocessing/dualgnn-gen-u-u-matrix.py:14-41`: for every user, neighbors
are other users weighted by the number of co-interacted train items, sorted
descending.  Output: `user_graph_dict.npy` with ``{u: ([neighbors],
[weights])}`` — the exact format DualGNN/DRAGON/MENTOR load.  (The engine
itself rebuilds this on the fly via `graph/usergraph.py`; this script exists
for artifact parity.)

Usage: python preprocessing/gen_user_graph.py data/<ds>/<ds>.inter
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd
from scipy import sparse as sp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("inter")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    df = pd.read_csv(args.inter, sep="\t")
    train = df[df["x_label"] == 0] if "x_label" in df else df
    u = train["userID"].to_numpy()
    i = train["itemID"].to_numpy()
    n_users = int(df["userID"].max()) + 1
    n_items = int(df["itemID"].max()) + 1

    R = sp.csr_matrix((np.ones(len(u), np.float32), (u, i)), shape=(n_users, n_items))
    C = (R @ R.T).tocsr()
    C.setdiag(0)
    C.eliminate_zeros()

    graph = {}
    for uu in range(n_users):
        s, e = C.indptr[uu], C.indptr[uu + 1]
        cols, vals = C.indices[s:e], C.data[s:e]
        order = np.argsort(-vals, kind="stable")
        graph[uu] = (cols[order].tolist(), vals[order].tolist())

    out = args.out or os.path.join(os.path.dirname(args.inter), "user_graph_dict.npy")
    np.save(out, graph, allow_pickle=True)
    print(f"wrote {out}: {n_users} users")


if __name__ == "__main__":
    main()

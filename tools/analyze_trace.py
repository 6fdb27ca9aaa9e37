"""Summarize a JAX profiler xplane trace: top device ops by total time with
their HLO metadata (shapes / bytes where present).

Usage: python tools/analyze_trace.py /tmp/prof_dir [-n 30]
       python tools/analyze_trace.py /tmp/prof_dir --per-step 134

--per-step N groups ops by name prefix and prints ms/step for ops firing
>= N/2 times (async copy/slice-start rows are DMA-queue occupancy, not
critical path — read the compute groups).
"""

from __future__ import annotations

import argparse
import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E501 (ships with tf)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("profile_dir")
    p.add_argument("-n", type=int, default=30)
    p.add_argument("--plane", default="TPU", help="substring of plane name")
    p.add_argument("--per-step", type=int, default=0, metavar="STEPS",
                   help="aggregate by op-name prefix, print ms per step")
    args = p.parse_args()

    paths = glob.glob(args.profile_dir + "/plugins/profile/*/*.xplane.pb")
    if not paths:
        sys.exit(f"no xplane.pb under {args.profile_dir}")
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if args.plane.lower() not in plane.name.lower():
            continue
        em = plane.event_metadata
        sm = plane.stat_metadata
        tot = collections.Counter()
        cnt = collections.Counter()
        meta = {}
        for line in plane.lines:
            for ev in line.events:
                md = em[ev.metadata_id]
                name = md.name
                tot[name] += ev.duration_ps
                cnt[name] += 1
                if name not in meta:
                    stats = {}
                    for st in list(ev.stats) + list(md.stats):
                        key = sm[st.metadata_id].name
                        val = (st.str_value or st.int64_value or
                               st.uint64_value or st.double_value)
                        if st.ref_value:
                            val = sm[st.ref_value].name
                        stats[key] = val
                    meta[name] = stats
        total_ps = sum(tot.values())
        print(f"\n=== plane: {plane.name}  total {total_ps/1e12:.3f}s "
              f"(sum over lines)")
        if args.per_step:
            import re

            groups = collections.Counter()
            gcnt = collections.Counter()
            for name, ps in tot.items():
                if cnt[name] < args.per_step // 2:
                    continue
                m = re.match(r"%?([a-zA-Z_\-\.]+)", name)
                g = re.sub(r"[\.\d]+$", "", m.group(1)) if m else name
                groups[g] += ps
                gcnt[g] += cnt[name]
            for g, ps in groups.most_common(args.n):
                print(f"{ps/1e9/args.per_step:8.3f} ms/step x{gcnt[g]:<7} {g}")
            continue
        for name, ps in tot.most_common(args.n):
            st = meta.get(name, {})
            extra = []
            for k in ("tf_op", "hlo_category", "bytes_accessed",
                      "flops", "shape_with_layout", "long_name"):
                if k in st:
                    v = st[k]
                    if k == "bytes_accessed":
                        v = f"{int(v)/1e6:.0f}MB"
                    extra.append(f"{k}={v}")
            print(f"{ps/1e9:10.3f}ms x{cnt[name]:<5} {name[:60]:60s} "
                  + " ".join(str(e)[:90] for e in extra))


if __name__ == "__main__":
    main()

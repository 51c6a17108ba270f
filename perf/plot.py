"""Render the GFLOPS-vs-size sweep as a PNG — the analog of the
reference harness's VegaLite plot (reference perf/lu.jl:60-81, which
plots GFLOPS vs matrix size per variant).

Usage:  python perf/sweep.py --out perf/results.json
        python perf/plot.py perf/results.json [perf/results.png]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "perf/results.json"
    dst = sys.argv[2] if len(sys.argv) > 2 else src.rsplit(".", 1)[0] + ".png"

    records = [json.loads(line) for line in open(src) if line.strip()]
    square = [r for r in records if "variant" in r and "n" in r
              and "gflops" in r and "batch" not in r and "m" not in r
              and "abs_err" not in r]
    variants = sorted({r["variant"] for r in square})

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for v in variants:
        pts = sorted(
            [(r["n"], r["gflops"]) for r in square if r["variant"] == v]
        )
        if pts:
            ax.plot(*zip(*pts), marker="o", label=v)
    ax.set_xscale("log", base=2)
    ax.set_xlabel("matrix size n")
    ax.set_ylabel("GFLOP/s (luflop ~ 2n^3/3)")
    dtypes = ", ".join(sorted({r.get("dtype", "?") for r in square}))
    ax.set_title(f"LU factorization throughput ({dtypes})")
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(dst, dpi=120)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()

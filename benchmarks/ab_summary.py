"""Summarize the four quality A/B results: final AND best-checkpoint view.

The reference tracks best checkpoints per metric (utils/best_information.py),
so the protocol-aligned comparison is best-over-training, not the final
epoch. Reads benchmarks/quality_ab*_result.json and prints one table per
family with both views. Run: python benchmarks/ab_summary.py
"""

from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))

# metric -> whether higher is better
DIRECTION = {"PSNR": True, "psnr": True, "L1": False, "pixelFID": False,
             "mean_gap": False, "std_gap": False}


def better(metric: str):
    for key, hi in DIRECTION.items():
        if key in metric:
            return max if hi else min
    return min


def summarize(path: str):
    with open(path) as f:
        r = json.load(f)
    fam = os.path.basename(path).replace("quality_ab_", "").replace(
        "_result.json", "").replace("result.json", "pix2pix")
    fam = {"128": "pix2pix-128(ample)",
           "128_starved": "pix2pix-128(starved)"}.get(fam, fam)
    print(f"\n== {fam}  (student {r.get('student_gmacs')} GMACs, "
          f"backend {r.get('backend')}) ==")
    metrics = [k for k in r["branches"][0]["curve"][0] if k != "epoch"]
    rows = {}
    for b in r["branches"]:
        fin = b["final"]
        best = {m: better(m)(c[m] for c in b["curve"]) for m in metrics}
        rows[b["kind"]] = (fin, best)
    head = f"{'metric':<16}" + "".join(
        f"{k + ' final':>14}{k + ' best':>14}" for k in rows)
    print(head)
    for m in metrics:
        line = f"{m:<16}"
        for k in rows:
            fin, best = rows[k]
            line += f"{fin[m]:>14}{best[m]:>14}"
        print(line)


def main():
    for name in ("quality_ab_result.json", "quality_ab_128_result.json",
                 "quality_ab_128_starved_result.json",
                 "quality_ab_cyclegan_result.json",
                 "quality_ab_srgan_result.json",
                 "quality_ab_sagan_result.json"):
        p = os.path.join(HERE, name)
        if os.path.exists(p):
            summarize(p)
        else:
            print(f"(missing {name})")


if __name__ == "__main__":
    main()

"""Debug/observability utilities.

  * plot_weight_distribution — conv-weight norm histograms for choosing
    prune thresholds (utils/plot_weight_distribute.py:11-37)
  * HTMLGallery — dependency-free replacement for the dominate-based HTML
    result browser (utils/html.py:6-86; the reference's visdom Visualizer is
    dead code, options/options.py:46-54)
"""

from __future__ import annotations

import html
import os
from typing import Dict, List

import numpy as np


def plot_weight_distribution(params: dict, out_dir: str,
                             bins: int = 100) -> List[str]:
    """Histogram of per-out-channel L1 norms for every conv kernel."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from gcc_tpu.compress.prune import l1_out

    os.makedirs(out_dir, exist_ok=True)
    written = []

    def walk(node, prefix=""):
        for k, v in node.items():
            name = f"{prefix}{k}"
            if isinstance(v, dict):
                walk(v, name + "/")
            elif k == "kernel" and np.ndim(v) == 4:
                norms = l1_out(v)
                fig, ax = plt.subplots(figsize=(4, 3))
                ax.hist(norms, bins=min(bins, max(10, len(norms) // 2)))
                ax.set_title(name, fontsize=8)
                ax.set_xlabel("per-filter L1 norm")
                fname = os.path.join(
                    out_dir, name.replace("/", "_") + ".png")
                fig.tight_layout()
                fig.savefig(fname, dpi=80)
                plt.close(fig)
                written.append(fname)

    walk(params)
    return written


def diagnose_network(grads_or_params, name: str = "network") -> float:
    """Mean absolute value across all leaves (utils/util.py:134-150)."""
    import jax
    leaves = [np.abs(np.asarray(x)).mean()
              for x in jax.tree_util.tree_leaves(grads_or_params)]
    mean = float(np.mean(leaves)) if leaves else 0.0
    print(f"{name}: mean abs = {mean:.6f}")
    return mean


class HTMLGallery:
    """Minimal static HTML image gallery (one row per sample)."""

    def __init__(self, web_dir: str, title: str = "results"):
        self.web_dir = web_dir
        self.img_dir = os.path.join(web_dir, "images")
        self.title = title
        self.rows: List = []
        os.makedirs(self.img_dir, exist_ok=True)

    def add_images(self, images: Dict[str, np.ndarray], name: str,
                   width: int = 256) -> None:
        from gcc_tpu.utils.image import tensor2im
        from PIL import Image
        cells = []
        for label, arr in images.items():
            fname = f"{name}_{label}.png"
            Image.fromarray(tensor2im(arr)).save(
                os.path.join(self.img_dir, fname))
            cells.append((label, fname, width))
        self.rows.append((name, cells))

    def save(self) -> str:
        parts = [f"<html><head><title>{html.escape(self.title)}</title>"
                 "</head><body>"]
        for name, cells in self.rows:
            parts.append(f"<h3>{html.escape(name)}</h3><table><tr>")
            for label, fname, width in cells:
                parts.append(
                    f"<td style='text-align:center'>"
                    f"<img src='images/{fname}' width='{width}'/><br>"
                    f"{html.escape(label)}</td>")
            parts.append("</tr></table>")
        parts.append("</body></html>")
        path = os.path.join(self.web_dir, "index.html")
        with open(path, "w") as f:
            f.write("".join(parts))
        return path

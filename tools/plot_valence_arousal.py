"""Valence-arousal plot for expression annotations (rebuild of
scripts/plot_valence_arousal_plain.py): circular mean/variance of
annotated (valence, arousal) points per expression, drawn as filled
sectors on the affect circumplex.

    python tools/plot_valence_arousal.py data/valence_arousal.csv out.png

CSV: one header line, then rows `label,valence,arousal[,...]` with
valence/arousal in [-1, 1].
"""

import sys

import numpy as np


def circular_mean_std(points: np.ndarray):
    """Mean direction + circular std of 2-d affect points
    (plot_valence_arousal_plain.py calculate_mean_variance, using the
    standard atan2 form so all four quadrants resolve)."""
    theta = np.arctan2(points[:, 1], points[:, 0])
    m_x, m_y = np.mean(np.cos(theta)), np.mean(np.sin(theta))
    mu = np.arctan2(m_y, m_x)
    R = np.clip(np.sqrt(m_x ** 2 + m_y ** 2), 1e-9, 1.0)
    sigma = np.sqrt(-2 * np.log(R))
    return mu, sigma


def load_csv(path: str):
    groups = {}
    with open(path) as f:
        next(f)                                   # header
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 3:
                continue
            label, v, a = parts[0], float(parts[1]), float(parts[2])
            groups.setdefault(label, []).append((v, a))
    return {k: np.asarray(v) for k, v in groups.items()}


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    groups = load_csv(sys.argv[1])
    fig, ax = plt.subplots(figsize=(6, 6))
    circle = plt.Circle((0, 0), 1.0, fill=False, color="gray")
    ax.add_patch(circle)
    cmap = plt.get_cmap("tab10")
    for i, (label, pts) in enumerate(sorted(groups.items())):
        mu, sigma = circular_mean_std(pts)
        color = cmap(i % 10)
        phi = np.linspace(mu - sigma, mu + sigma, 64)
        ax.fill(np.concatenate([[0], np.cos(phi), [0]]),
                np.concatenate([[0], np.sin(phi), [0]]),
                alpha=0.35, color=color, label=label)
        ax.scatter(pts[:, 0], pts[:, 1], s=12, color=color)
    ax.axhline(0, color="gray", lw=0.5)
    ax.axvline(0, color="gray", lw=0.5)
    ax.set_xlabel("valence")
    ax.set_ylabel("arousal")
    ax.set_xlim(-1.1, 1.1)
    ax.set_ylim(-1.1, 1.1)
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    fig.savefig(sys.argv[2], dpi=150, bbox_inches="tight")
    print(f"wrote {sys.argv[2]}")


if __name__ == "__main__":
    main()

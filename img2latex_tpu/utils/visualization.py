"""Plot theming (reference ``img2latex/utils/visualization.py:12-61``)."""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")  # headless everywhere; figures are file artifacts

DEFAULT_THEME = {
    "background": "#1e1e2e",
    "surface": "#27273a",
    "text": "#cdd6f4",
    "grid": "#45475a",
    "accent": "#89b4fa",
    "accent2": "#f38ba8",
    "accent3": "#a6e3a1",
    "accent4": "#fab387",
}

PALETTE = [
    DEFAULT_THEME["accent"],
    DEFAULT_THEME["accent2"],
    DEFAULT_THEME["accent3"],
    DEFAULT_THEME["accent4"],
    "#cba6f7",
    "#94e2d5",
]


def apply_dark_theme() -> None:
    import matplotlib.pyplot as plt

    plt.rcParams.update(
        {
            "figure.facecolor": DEFAULT_THEME["background"],
            "axes.facecolor": DEFAULT_THEME["surface"],
            "savefig.facecolor": DEFAULT_THEME["background"],
            "text.color": DEFAULT_THEME["text"],
            "axes.labelcolor": DEFAULT_THEME["text"],
            "xtick.color": DEFAULT_THEME["text"],
            "ytick.color": DEFAULT_THEME["text"],
            "axes.edgecolor": DEFAULT_THEME["grid"],
            "grid.color": DEFAULT_THEME["grid"],
            "axes.grid": True,
            "grid.alpha": 0.4,
            "axes.prop_cycle": matplotlib.cycler(color=PALETTE),
        }
    )
    try:
        import seaborn as sns

        sns.set_palette(PALETTE)
    except ImportError:
        pass


def ensure_plots_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path

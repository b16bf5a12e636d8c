"""Benchmark figure families (reference cmd/benchmark_cache.py:462-598).

Five families from the benchmark CSV: speedup bars, time bars, cache-hit vs
speedup scatter, per-parameter ablation panels, and a color-coded summary
table.  Pure matplotlib (Agg), saved as PDF + PNG.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Optional

import pandas as pd


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


#: sweep-arm name → (parameter, numeric value), e.g. "score_R20" → ("R", 20)
_SWEEP_RE = re.compile(
    r"^(?:score_R(?P<R>[\d.]+)|score_tau(?P<tau_0>[\d.]+)"
    r"|kv_K(?P<K>[\d.]+)|token_b(?P<token_budget>[\d.]+))$"
)


def parse_sweep_params(df: pd.DataFrame) -> pd.DataFrame:
    """Annotate sweep rows with Parameter/Value columns inferred from the
    method name (the reference carries them explicitly,
    benchmark_cache.py:273-422)."""
    params, values = [], []
    for method in df["method"]:
        m = _SWEEP_RE.match(str(method))
        if m:
            key = next(k for k, v in m.groupdict().items() if v is not None)
            params.append(key)
            values.append(float(m.group(key)))
        else:
            params.append(None)
            values.append(float("nan"))
    out = df.copy()
    out["Parameter"] = params
    out["Value"] = values
    return out


def _save(fig, figures_dir: Path, stem: str) -> None:
    fig.savefig(figures_dir / f"{stem}.pdf", bbox_inches="tight")
    fig.savefig(figures_dir / f"{stem}.png", dpi=150, bbox_inches="tight")


def create_benchmark_figures(
    df: pd.DataFrame,
    output_dir: Path | str,
    model_id: str = "model",
    hit_ratio_col: str = "cache_cache_hit_ratio",
) -> list[Path]:
    """Emit all five figure families; returns the written figure paths."""
    plt = _plt()
    figures_dir = Path(output_dir) / "figures"
    figures_dir.mkdir(parents=True, exist_ok=True)
    df = parse_sweep_params(df)
    is_base = df["method"] == "baseline"
    written: list[Path] = []

    # 1. Speedup comparison (reference :481-494)
    sub = df[~is_base & df["speedup"].notna()].sort_values("speedup")
    if len(sub):
        fig, ax = plt.subplots(figsize=(9, max(3, 0.4 * len(sub))))
        colors = ["tab:green" if s > 1.0 else "tab:red" for s in sub["speedup"]]
        ax.barh(sub["method"], sub["speedup"], color=colors)
        ax.axvline(1.0, color="black", ls="--", lw=1, label="baseline (1.0x)")
        ax.set_xlabel("Speedup (x)")
        ax.set_title(f"Cache performance comparison — {model_id}")
        ax.legend()
        ax.grid(axis="x", alpha=0.3)
        fig.tight_layout()
        _save(fig, figures_dir, f"speedup_comparison_{model_id}")
        plt.close(fig)
        written.append(figures_dir / f"speedup_comparison_{model_id}.pdf")

    # 2. Time comparison (reference :496-509)
    sub = df[df["time_s"].notna()].sort_values("time_s")
    if len(sub):
        fig, ax = plt.subplots(figsize=(9, max(3, 0.4 * len(sub))))
        colors = [
            "tab:blue" if m == "baseline" else "tab:orange" for m in sub["method"]
        ]
        ax.barh(sub["method"], sub["time_s"], color=colors)
        ax.set_xlabel("Time (s)")
        ax.set_title(f"Sampling time comparison — {model_id}")
        ax.grid(axis="x", alpha=0.3)
        fig.tight_layout()
        _save(fig, figures_dir, f"time_comparison_{model_id}")
        plt.close(fig)
        written.append(figures_dir / f"time_comparison_{model_id}.pdf")

    # 3. Cache-hit ratio vs speedup (reference :511-530)
    if hit_ratio_col in df.columns:
        sub = df[~is_base & df[hit_ratio_col].notna() & df["speedup"].notna()]
        if len(sub):
            fig, ax = plt.subplots(figsize=(6.5, 4.5))
            sc = ax.scatter(
                sub[hit_ratio_col], sub["speedup"], s=80, alpha=0.7,
                c=sub["time_s"], cmap="viridis_r",
            )
            ax.set_xlabel("Cache hit ratio")
            ax.set_ylabel("Speedup (x)")
            ax.set_title(f"Cache hit ratio vs speedup — {model_id}")
            ax.grid(alpha=0.3)
            fig.colorbar(sc, ax=ax, label="Time (s)")
            fig.tight_layout()
            _save(fig, figures_dir, f"cache_hit_vs_speedup_{model_id}")
            plt.close(fig)
            written.append(figures_dir / f"cache_hit_vs_speedup_{model_id}.pdf")

    # 4. Per-parameter ablation panels (reference :532-562)
    for param in ("K", "R", "tau_0", "token_budget"):
        sub = df[df["Parameter"] == param].sort_values("Value")
        if sub.empty:
            continue
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 3.8))
        ax1.plot(sub["Value"], sub["speedup"], marker="o")
        ax1.axhline(1.0, color="black", ls="--", lw=1, alpha=0.5)
        ax1.set_xlabel(param)
        ax1.set_ylabel("Speedup (x)")
        ax1.set_title(f"Speedup vs {param}")
        ax1.grid(alpha=0.3)
        ycol = hit_ratio_col if hit_ratio_col in sub.columns else "speedup"
        ax2.plot(sub["Value"], sub[ycol], marker="s", color="tab:orange")
        ax2.set_xlabel(param)
        ax2.set_ylabel("Cache hit ratio")
        ax2.set_ylim(0, 1.1)
        ax2.set_title(f"Cache hit ratio vs {param}")
        ax2.grid(alpha=0.3)
        fig.tight_layout()
        _save(fig, figures_dir, f"ablation_{param.lower()}_{model_id}")
        plt.close(fig)
        written.append(figures_dir / f"ablation_{param.lower()}_{model_id}.pdf")

    # 5. Summary table (reference :564-598)
    cols = [
        c
        for c in ("method", "time_s", "speedup", hit_ratio_col,
                  "cache_steps_skipped_ratio", "sw_vs_baseline")
        if c in df.columns
    ]
    table_df = df[cols].copy()
    for c in table_df.columns:
        if table_df[c].dtype.kind == "f":
            table_df[c] = table_df[c].round(3)
    fig, ax = plt.subplots(figsize=(11, 0.4 * len(table_df) + 1.5))
    ax.axis("off")
    table = ax.table(
        cellText=table_df.fillna("").values.tolist(),
        colLabels=[c.replace("cache_", "") for c in table_df.columns],
        cellLoc="center", loc="center",
    )
    table.auto_set_font_size(False)
    table.set_fontsize(8)
    table.scale(1, 1.4)
    for i in range(len(table_df)):
        color: Optional[str] = None
        if table_df.iloc[i]["method"] == "baseline":
            color = "#ecf0f1"
        elif float(table_df.iloc[i].get("speedup") or 0) > 1.0:
            color = "#e8f8f5"
        if color:
            for j in range(len(table_df.columns)):
                table[(i + 1, j)].set_facecolor(color)
    ax.set_title(f"Cache benchmark summary — {model_id}", pad=12)
    _save(fig, figures_dir, f"summary_table_{model_id}")
    plt.close(fig)
    written.append(figures_dir / f"summary_table_{model_id}.pdf")
    return written


def shape_scaling_figure(
    payload: dict, output_dir: Path | str, stem: str = "shape_scaling"
) -> Optional[Path]:
    """Speedup-per-dataset-shape bars from the shape_scaling.json artifact
    (scripts/bench_shape_scaling.py) — the TPU analog of the reference
    paper's per-dataset speedup claim (§4.1: 2.1-4.3x, avg 3.2x across the
    same five shapes, measured on CPU at batch 1).

    Returns the written PDF path, or None if no shape has a speedup yet.
    """
    shapes = {
        name: entry
        for name, entry in payload.get("shapes", {}).items()
        if entry.get("speedup") is not None
    }
    if not shapes:
        return None
    plt = _plt()
    figures_dir = Path(output_dir) / "figures"
    figures_dir.mkdir(parents=True, exist_ok=True)
    names = sorted(shapes, key=lambda n: shapes[n]["speedup"])
    labels = [
        f"{n}\n({shapes[n]['max_len']}x{shapes[n]['n_channels']})" for n in names
    ]
    speedups = [shapes[n]["speedup"] for n in names]
    skipped = [shapes[n].get("steps_skipped_ratio") for n in names]
    fig, ax = plt.subplots(figsize=(8, 4.5))
    bars = ax.bar(labels, speedups, color="tab:green", alpha=0.85)
    for bar, sp, sk in zip(bars, speedups, skipped):
        note = f"{sp:.1f}x" + (f"\n{100 * sk:.0f}% skip" if sk is not None else "")
        ax.annotate(
            note, (bar.get_x() + bar.get_width() / 2, bar.get_height()),
            ha="center", va="bottom", fontsize=8,
        )
    ax.axhline(
        3.2, color="tab:gray", ls="--", lw=1,
        label="reference paper avg (3.2x, CPU)",
    )
    ax.axhline(1.0, color="black", ls=":", lw=1)
    ax.set_ylabel("E2-CRF speedup over uncached (x)")
    ax.set_ylim(0, max(speedups) * 1.2)
    ax.set_title("E2-CRF speedup across the five reference dataset shapes")
    ax.legend()
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    _save(fig, figures_dir, stem)
    plt.close(fig)
    return figures_dir / f"{stem}.pdf"

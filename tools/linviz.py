"""Porcupine-style linearizability VISUALIZER — the diagnostic HTML the
reference ships (`/root/reference/src/porcupine/visualization.go`: an
interactive timeline of a concurrent history), re-done dependency-free.

Renders a KV history as a standalone HTML/SVG page: one lane per
client, each operation drawn as its [call, ret] interval bar labeled
`op(key, arg) -> result`. When the Wing & Gong checker
(tests/test_linearizability.py::linearization) finds a witness order,
each bar gets its linearization index and a tick at an in-window
linearization point consistent with the order; when the history is NOT
linearizable, the page says so and shards are colored by their
per-shard verdict (the sharded decomposition pinpoints which shard's
serving history broke — the migration-debugging view).

Usage:
    python tools/linviz.py out.html          # demo history
    from tools.linviz import render_history  # library use
"""

from __future__ import annotations

import html
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_linearizability import (  # noqa: E402
    HistOp,
    linearization,
    partition_by_shard,
)

LANE_H = 34
BAR_H = 20
PX_PER_TICK = 28
LEFT_PAD = 90


def _lin_points(history: list[HistOp], order: list[int]) -> dict[int, float]:
    """In-window linearization points consistent with the witness order:
    point[i] strictly increases along the order and stays inside
    [call, ret] — a constructive proof the order is legal in real time
    (greedy: each point is max(call, prev + eps) <= ret)."""
    pts: dict[int, float] = {}
    t = float("-inf")
    for i in order:
        op = history[i]
        t = max(op.call, t + 0.125)
        assert t <= op.ret, "witness order violates an op window"
        pts[i] = t
    return pts


def render_history(history: list[HistOp], title: str = "KV history") -> str:
    """Standalone HTML/SVG for one history (see module docstring)."""
    order = linearization(history)
    verdicts = {
        shard: linearization(part) is not None
        for shard, part in partition_by_shard(history).items()
    }
    clients = sorted({op.client for op in history})
    lane = {c: k for k, c in enumerate(clients)}
    tmax = max(op.ret for op in history) + 1
    width = LEFT_PAD + tmax * PX_PER_TICK + 40
    height = (len(clients) + 1) * LANE_H + 60
    pts = _lin_points(history, order) if order is not None else {}
    rank = {i: k for k, i in enumerate(order)} if order is not None else {}

    parts = [
        f'<svg width="{width}" height="{height}" '
        'font-family="monospace" font-size="11">'
    ]
    for c in clients:
        y = 30 + lane[c] * LANE_H
        parts.append(
            f'<text x="6" y="{y + BAR_H - 6}">client {c}</text>'
            f'<line x1="{LEFT_PAD}" y1="{y + BAR_H / 2}" '
            f'x2="{width - 20}" y2="{y + BAR_H / 2}" stroke="#ddd"/>'
        )
    for i, op in enumerate(history):
        y = 30 + lane[op.client] * LANE_H
        x0 = LEFT_PAD + op.call * PX_PER_TICK
        x1 = LEFT_PAD + op.ret * PX_PER_TICK
        shard_ok = verdicts[
            (ord(op.key[0]) % 10) if op.key else 0
        ]
        fill = "#9fd49f" if shard_ok else "#e09a9a"
        label = f"{op.op}({op.key}"
        if op.arg:
            label += f", {op.arg}"
        label += ")"
        if op.op == "get":
            label += f" -> {op.result!r}"
        parts.append(
            f'<rect x="{x0}" y="{y}" width="{max(x1 - x0, 2)}" '
            f'height="{BAR_H}" rx="3" fill="{fill}" stroke="#555"/>'
            f'<text x="{x0 + 3}" y="{y + BAR_H - 6}">'
            f"{html.escape(label)}</text>"
        )
        if i in pts:
            px = LEFT_PAD + pts[i] * PX_PER_TICK
            parts.append(
                f'<line x1="{px}" y1="{y - 2}" x2="{px}" '
                f'y2="{y + BAR_H + 2}" stroke="#222" stroke-width="2"/>'
                f'<text x="{px + 2}" y="{y - 3}" fill="#222">'
                f"#{rank[i]}</text>"
            )
    parts.append("</svg>")
    verdict_line = (
        "linearizable — ticks mark a witness linearization"
        if order is not None
        else "NOT linearizable — red bars sit on the violating shard(s): "
        + ", ".join(str(s) for s, ok in sorted(verdicts.items()) if not ok)
    )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)}</title></head><body>"
        f"<h3>{html.escape(title)}</h3><p>{html.escape(verdict_line)}</p>"
        + "".join(parts)
        + "</body></html>"
    )


def _demo() -> list[HistOp]:
    return [
        HistOp(0, "append", "a1", "x", "", call=0, ret=2),
        HistOp(1, "append", "a1", "y", "", call=1, ret=3),
        HistOp(2, "get", "a1", "", "xy", call=4, ret=6),
        HistOp(0, "put", "b1", "v", "", call=3, ret=5),
        HistOp(1, "get", "b1", "", "", call=6, ret=8),  # stale: shard of b1
    ]


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "linviz.html"
    with open(out, "w") as f:
        f.write(render_history(_demo(), "demo history (one broken shard)"))
    print(f"wrote {out}")

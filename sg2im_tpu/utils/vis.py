"""Visualization: scene-graph rendering (GraphViz) and layout drawing.

Host-side port of reference ``sg2im/vis.py``.  GraphViz rendering shells out
to ``dot`` exactly like the reference (``vis.py:110-192``) and degrades
gracefully when the binary is missing.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np


def have_graphviz() -> bool:
    try:
        subprocess.run(["dot", "-V"], capture_output=True, check=False)
        return True
    except FileNotFoundError:
        return False


def draw_scene_graph(objs, triples, vocab=None, output_filename=None,
                     orientation="V", edge_width=6, arrow_size=1.5,
                     binary_edge_weight=1.2, ignore_dummies=True):
    """Render a scene graph to an RGB array via GraphViz.

    Mirrors reference ``draw_scene_graph`` (``sg2im/vis.py:110-192``): object
    nodes pink, predicate nodes blue, ``__image__``/``__in_image__`` dummies
    skipped by default.  ``objs``/``triples`` are name lists, or index
    arrays when ``vocab`` is given.
    """
    if orientation not in ("V", "H"):
        raise ValueError(f'Invalid orientation "{orientation}"')
    rankdir = {"H": "LR", "V": "TD"}[orientation]

    if vocab is not None:
        objs = [vocab["object_idx_to_name"][int(i)] for i in np.asarray(objs)]
        triples = [
            [int(s), vocab["pred_idx_to_name"][int(p)], int(o)]
            for s, p, o in np.asarray(triples)
        ]

    lines = [
        "digraph{",
        'graph [size="5,3",ratio="compress",dpi="300",bgcolor="transparent"]',
        f"rankdir={rankdir}",
        'nodesep="0.5"',
        'ranksep="0.5"',
        'node [shape="box",style="rounded,filled",fontsize="48",color="none"]',
        'node [fillcolor="lightpink1"]',
    ]
    for i, obj in enumerate(objs):
        if ignore_dummies and obj == "__image__":
            continue
        lines.append(f'{i} [label="{obj}"]')
    next_node_id = len(objs)
    lines.append('node [fillcolor="lightblue1"]')
    for s, p, o in triples:
        if ignore_dummies and p == "__in_image__":
            continue
        lines += [
            f'{next_node_id} [label="{p}"]',
            f"{s}->{next_node_id} [penwidth={edge_width},"
            f"arrowsize={arrow_size},weight={binary_edge_weight}]",
            f"{next_node_id}->{o} [penwidth={edge_width},"
            f"arrowsize={arrow_size},weight={binary_edge_weight}]",
        ]
        next_node_id += 1
    lines.append("}")

    with tempfile.TemporaryDirectory() as td:
        dot_path = os.path.join(td, "sg.dot")
        out_path = output_filename or os.path.join(td, "sg.png")
        fmt = os.path.splitext(out_path)[1][1:] or "png"
        with open(dot_path, "w") as f:
            f.write("\n".join(lines) + "\n")
        with open(out_path, "wb") as f:
            subprocess.run(["dot", f"-T{fmt}", dot_path], stdout=f, check=True)
        from PIL import Image

        img = np.asarray(Image.open(out_path).convert("RGB"))
    return img


def draw_layout_array(boxes, obj_names, H=256, W=256):
    """Simple rasterized layout preview (box outlines burned into an array).

    A dependency-light stand-in for the matplotlib drawing at
    ``sg2im/vis.py:30-107``; returns (H, W, 3) uint8.
    """
    canvas = np.full((H, W, 3), 255, np.uint8)
    rng = np.random.RandomState(0)
    for i, box in enumerate(np.asarray(boxes)):
        color = rng.randint(0, 200, 3)
        x0, y0, x1, y1 = (np.clip(box, 0, 1) * [W - 1, H - 1, W - 1, H - 1]
                          ).astype(int)
        canvas[y0:y1 + 1, x0, :] = color
        canvas[y0:y1 + 1, x1, :] = color
        canvas[y0, x0:x1 + 1, :] = color
        canvas[y1, x0:x1 + 1, :] = color
    return canvas

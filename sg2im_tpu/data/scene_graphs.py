"""JSON scene-graph encoding (reference ``Sg2ImModel.encode_scene_graphs``,
``sg2im/model.py:173-227``).

Each graph dict has ``objects`` (names) and ``relationships``
([s_idx, pred_name, o_idx]).  Encoding appends a ``__image__`` object plus
``__in_image__`` edges from every object to it, then maps names to vocab
indices.  Unlike the reference (which mutates the caller's dicts in place,
``model.py:205-209``) this function leaves inputs untouched.
"""

from __future__ import annotations

from typing import Any, Sequence

from sg2im_tpu.data.batching import GraphBatch, pad_graphs


def encode_scene_graphs(scene_graphs, vocab, O_max: int | None = None,
                        T_max: int | None = None, align: int = 1) -> GraphBatch:
    """Encode one dict or a list of scene-graph dicts into a GraphBatch."""
    if isinstance(scene_graphs, dict):
        scene_graphs = [scene_graphs]

    name_to_idx = vocab["object_name_to_idx"]
    pred_to_idx = vocab["pred_name_to_idx"]

    objs_list, triples_list = [], []
    for sg in scene_graphs:
        objects = list(sg["objects"]) + ["__image__"]
        image_idx = len(objects) - 1
        rels = [list(r) for r in sg["relationships"]]
        rels += [[j, "__in_image__", image_idx] for j in range(image_idx)]

        obj_ids = []
        for name in objects:
            if name not in name_to_idx:
                raise ValueError(f'Object "{name}" not in vocab')
            obj_ids.append(name_to_idx[name])
        triples = []
        for s, p, o in rels:
            if p not in pred_to_idx:
                raise ValueError(f'Relationship "{p}" not in vocab')
            if not (0 <= s < len(objects)) or not (0 <= o < len(objects)):
                # XLA gathers clamp silently; fail loudly like torch would.
                raise ValueError(
                    f"Relationship endpoint out of range: [{s}, {p!r}, {o}] "
                    f"for a {image_idx}-object graph")
            triples.append([s, pred_to_idx[p], o])
        objs_list.append(obj_ids)
        triples_list.append(triples)

    import numpy as np

    return pad_graphs(
        [np.asarray(o, np.int32) for o in objs_list],
        [np.asarray(t, np.int32).reshape(-1, 3) for t in triples_list],
        O_max=O_max, T_max=T_max, align=align,
    )

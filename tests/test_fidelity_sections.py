"""Per-section parity vs the reference (the FIDELITY.md attribution,
as a permanent regression gate).

The end-to-end parity tests bound the final image; this pins EVERY
section boundary (GCN layers, box/mask/rel heads, composed layout, each
CRN stage) so a future parity break is localized to the section that
introduced it instead of surfacing as an opaque e2e PSNR drop.  On the
CPU backend all sections match the torch reference to ~1e-6 relative
(measured headroom ~1e-7-1e-6; threshold 20x above the observed worst).
"""

import numpy as np

from scripts.attrib_psnr import build_proxy, relerr, run_ours, run_reference


def test_every_section_matches_reference(tmp_path):
    import json
    import os

    import torch

    from sg2im_tpu.ckpt.torch_compat import (
        torch04_semantics, zeros_randn_override)

    with torch04_semantics(randn_override=zeros_randn_override):
        model, vocab, model_kwargs, sgs = build_proxy("tiny")
        ref = run_reference(model, sgs)
        ckpt = {"model_state": model.state_dict(),
                "model_kwargs": dict(model_kwargs, vocab=vocab),
                "args": {"dataset": "vg"}}
        path = os.path.join(tmp_path, "synth.pt")
        torch.save(ckpt, path)
        ours = run_ours(path, sgs, len(model_kwargs["refinement_dims"]))

    checked = 0
    report = {}
    for k, r in ref.items():
        o = ours.get(k)
        if o is None:
            continue
        assert r.shape == o.shape, (k, r.shape, o.shape)
        e = relerr(o, r)
        report[k] = e
        assert e < 2e-5, (
            f"section {k} diverged from the reference: relerr {e:.3e} "
            f"(full report: {json.dumps({k2: f'{v:.2e}' for k2, v in report.items()})})")
        checked += 1
    # gcn, boxes, masks, rel, layout, >=2 CRN stages, final image
    assert checked >= 8, f"only {checked} sections compared: {list(report)}"

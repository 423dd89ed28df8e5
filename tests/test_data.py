"""Data pipeline tests: RLE codec, COCO/VG dataset parity vs the reference
implementations on synthetic fixtures, and the padded loader."""

import json
import os
import random
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from sg2im_tpu.data import rle as rle_mod
from sg2im_tpu.data.coco import CocoSceneGraphDataset
from sg2im_tpu.data.loader import PaddedLoader, collate_padded
from sg2im_tpu.data.vg import VgSceneGraphDataset

# ---------------------------------------------------------------------------
# RLE codec
# ---------------------------------------------------------------------------

def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        mask = (rng.rand(23, 17) > 0.6).astype(np.uint8)
        rle = rle_mod.mask_to_rle(mask)
        back = rle_mod.rle_to_mask(rle)
        np.testing.assert_array_equal(back, mask)


def test_rle_uncompressed_counts():
    # 3x4 mask, column-major runs: 2 zeros, 3 ones, 7 zeros
    rle = {"size": [3, 4], "counts": [2, 3, 7]}
    m = rle_mod.rle_to_mask(rle)
    expect = np.zeros((3, 4), np.uint8)
    flat = np.zeros(12, np.uint8)
    flat[2:5] = 1
    expect = flat.reshape((4, 3)).T
    np.testing.assert_array_equal(m, expect)


def test_polygon_rasterization():
    # A big axis-aligned square: interior must be filled.
    poly = [[2, 2, 10, 2, 10, 10, 2, 10]]
    m = rle_mod.polygons_to_mask(poly, 16, 16)
    assert m[6, 6] == 1 and m[0, 0] == 0 and m[15, 15] == 0
    assert m.sum() >= 64


def test_polygon_window_equals_crop():
    """Integer-offset window rasterization must equal cropping the full
    raster, under the caller contract: the offset is anchored at or left
    of the polygon's min vertex (shifted coordinates stay >= 0 — PIL's
    float scanline rounds negative coords toward zero)."""
    import math

    rng = np.random.RandomState(0)
    W = H = 97
    for trial in range(60):
        polys = []
        for _ in range(rng.randint(1, 4)):
            n = rng.randint(3, 9)
            cx, cy = rng.uniform(25, 70, 2)
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            rad = rng.uniform(3, 22, n)
            xs = np.clip(cx + rad * np.cos(ang), 0, W)
            ys = np.clip(cy + rad * np.sin(ang), 0, H)
            polys.append(np.stack([xs, ys], 1).reshape(-1).tolist())
        full = rle_mod.polygons_to_mask(polys, W, H)
        vx = math.floor(min(p[i] for p in polys
                            for i in range(0, len(p), 2)))
        vy = math.floor(min(p[i] for p in polys
                            for i in range(1, len(p), 2)))
        x0 = rng.randint(0, max(1, vx + 1))
        y0 = rng.randint(0, max(1, vy + 1))
        x1 = rng.randint(x0 + 1, W + 1)
        y1 = rng.randint(y0 + 1, H + 1)
        win = rle_mod.polygons_to_mask(polys, x1 - x0, y1 - y0,
                                       offset=(x0, y0))
        np.testing.assert_array_equal(win, full[y0:y1, x0:x1],
                                      err_msg=f"trial {trial}")


def test_coco_polygon_fast_path_matches_full_raster(tmp_path):
    """The loader's anchored-window polygon path must produce the SAME
    MxM thresholded masks as the full-image raster + numpy crop it
    replaced, on float-coordinate polygons (the realistic COCO case)."""
    import json as json_mod

    from PIL import Image

    from sg2im_tpu.data.coco import CocoSceneGraphDataset

    rng = np.random.RandomState(7)
    W, H = 320, 240
    img_dir = os.path.join(tmp_path, "images")
    os.makedirs(img_dir)
    Image.fromarray(rng.randint(0, 255, (H, W, 3), dtype=np.uint8)).save(
        os.path.join(img_dir, "i.png"))
    anns = []
    for j in range(6):
        n = rng.randint(3, 9)
        cx, cy = rng.uniform(60, 260), rng.uniform(50, 190)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(15, 45, n)
        xs = np.clip(cx + rad * np.cos(ang), 0, W - 1)
        ys = np.clip(cy + rad * np.sin(ang), 0, H - 1)
        poly = np.stack([xs, ys], 1).reshape(-1).round(2).tolist()
        x0, y0 = float(xs.min()), float(ys.min())
        anns.append({"id": j + 1, "image_id": 1, "category_id": 1 + j % 3,
                     "bbox": [x0, y0, float(xs.max() - x0),
                              float(ys.max() - y0)],
                     "segmentation": [poly]})
    inst = {"images": [{"id": 1, "file_name": "i.png",
                        "width": W, "height": H}],
            "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"},
                           {"id": 3, "name": "c"}],
            "annotations": anns}
    inst_path = os.path.join(tmp_path, "inst.json")
    with open(inst_path, "w") as f:
        json_mod.dump(inst, f)
    ds = CocoSceneGraphDataset(image_dir=img_dir, instances_json=inst_path,
                               stuff_json=None, stuff_only=False,
                               image_size=(64, 64), mask_size=16, seed=0,
                               min_objects_per_image=1,
                               max_objects_per_image=8)
    got = ds._decode_invariant(0)["masks"]

    # Reference computation: full-canvas raster + numpy crop.
    want = []
    for od in ds.image_id_to_objects[1]:
        x, y, w, h = od["bbox"]
        mask = rle_mod.seg_to_mask(od["segmentation"], W, H)
        mx0, mx1 = int(round(x)), max(int(round(x)) + 1, int(round(x + w)))
        my0, my1 = int(round(y)), max(int(round(y)) + 1, int(round(y + h)))
        mask = mask[my0:my1, mx0:mx1]
        from sg2im_tpu.data.decode import resize_u8

        m = resize_u8(mask * 255, (16, 16), ds.decoder)
        want.append((m.astype(np.float32) > 128).astype(np.int64))
    want.append(np.ones((16, 16), np.int64))
    np.testing.assert_array_equal(got, np.stack(want))


# ---------------------------------------------------------------------------
# Synthetic COCO fixture
# ---------------------------------------------------------------------------

def _fake_coco(tmp_path):
    from PIL import Image

    img_dir = os.path.join(tmp_path, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    images, inst_anns, stuff_anns = [], [], []
    W, H = 64, 48
    for i in range(4):
        fn = f"img{i}.png"
        Image.fromarray(
            rng.randint(0, 255, (H, W, 3), dtype=np.uint8)).save(
            os.path.join(img_dir, fn))
        images.append({"id": 100 + i, "file_name": fn,
                       "width": W, "height": H})
        # three instance objects per image (polygon segmentations)
        for j in range(3):
            x, y = 4 + 15 * j, 6 + 8 * j
            w, h = 14, 16
            poly = [[x, y, x + w, y, x + w, y + h, x, y + h]]
            inst_anns.append({
                "id": len(inst_anns) + 1, "image_id": 100 + i,
                "category_id": 1 + j, "bbox": [x, y, w, h],
                "segmentation": poly,
            })
        # one stuff object (compressed RLE) covering the bottom half
        m = np.zeros((H, W), np.uint8)
        m[H // 2:, :] = 1
        stuff_anns.append({
            "id": 1000 + i, "image_id": 100 + i, "category_id": 90,
            "bbox": [0, H // 2, W, H // 2],
            "segmentation": rle_mod.mask_to_rle(m),
        })
    instances = {
        "images": images,
        "categories": [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"},
                       {"id": 3, "name": "bird"}],
        "annotations": inst_anns,
    }
    stuff = {
        "images": images,
        "categories": [{"id": 90, "name": "grass"}],
        "annotations": stuff_anns,
    }
    inst_path = os.path.join(tmp_path, "instances.json")
    stuff_path = os.path.join(tmp_path, "stuff.json")
    with open(inst_path, "w") as f:
        json.dump(instances, f)
    with open(stuff_path, "w") as f:
        json.dump(stuff, f)
    return img_dir, inst_path, stuff_path


def _stub_reference_deps(monkeypatch):
    """Give the reference code pycocotools/skimage backed by our codec, so
    its dataset logic runs and we can diff against it."""
    mask_utils = types.ModuleType("pycocotools.mask")

    def frPyObjects(seg, h, w):
        if isinstance(seg, list):
            if seg and isinstance(seg[0], list):
                return [rle_mod.mask_to_rle(
                    rle_mod.polygons_to_mask([p], w, h)) for p in seg]
            return rle_mod.mask_to_rle(rle_mod.polygons_to_mask([seg], w, h))
        return {"size": seg["size"], "counts": rle_mod.encode_rle_counts(
            seg["counts"]).decode()}

    def merge(rles):
        m = None
        for r in rles:
            d = rle_mod.rle_to_mask(r)
            m = d if m is None else np.maximum(m, d)
        return rle_mod.mask_to_rle(m)

    mask_utils.frPyObjects = frPyObjects
    mask_utils.merge = merge
    mask_utils.decode = rle_mod.rle_to_mask
    pycocotools = types.ModuleType("pycocotools")
    pycocotools.mask = mask_utils
    monkeypatch.setitem(sys.modules, "pycocotools", pycocotools)
    monkeypatch.setitem(sys.modules, "pycocotools.mask", mask_utils)

    skimage = types.ModuleType("skimage")
    transform = types.ModuleType("skimage.transform")

    def resize(img, shape, mode=None):
        from PIL import Image

        out = Image.fromarray(img.astype(np.float32)).resize(
            (shape[1], shape[0]), Image.BILINEAR)
        return np.asarray(out, np.float64)

    transform.resize = resize
    skimage.transform = transform
    monkeypatch.setitem(sys.modules, "skimage", skimage)
    monkeypatch.setitem(sys.modules, "skimage.transform", transform)

    _stub_torchvision(monkeypatch)


def _stub_torchvision(monkeypatch):
    """Minimal torchvision.transforms for the reference data code."""
    import torch

    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    tvt.Compose = Compose
    tvt.ToTensor = ToTensor
    tvt.Normalize = Normalize
    tv.transforms = tvt
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.transforms", tvt)


def test_coco_dataset_matches_reference(tmp_path, monkeypatch):
    _stub_reference_deps(monkeypatch)
    img_dir, inst_path, stuff_path = _fake_coco(str(tmp_path))

    from sg2im.data.coco import CocoSceneGraphDataset as RefCoco

    kwargs = dict(image_dir=img_dir, instances_json=inst_path,
                  stuff_json=stuff_path, image_size=(32, 32), mask_size=8,
                  min_object_size=0.02, min_objects_per_image=3,
                  max_objects_per_image=8)
    ref = RefCoco(**kwargs)
    mine = CocoSceneGraphDataset(**kwargs)

    assert mine.vocab == ref.vocab
    assert len(mine) == len(ref)
    assert mine.total_objects() == ref.total_objects()

    for i in range(len(ref)):
        random.seed(42 + i)
        r_img, r_objs, r_boxes, r_masks, r_triples = ref[i]
        random.seed(42 + i)
        s = mine[i]
        np.testing.assert_array_equal(s["objs"], r_objs.numpy())
        np.testing.assert_allclose(s["boxes"], r_boxes.numpy(), atol=1e-6)
        np.testing.assert_array_equal(s["masks"], r_masks.numpy())
        np.testing.assert_array_equal(s["triples"], r_triples.numpy())
        np.testing.assert_allclose(
            s["image"], r_img.permute(1, 2, 0).numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# Synthetic VG fixture
# ---------------------------------------------------------------------------

def _fake_vg(tmp_path):
    import h5py
    from PIL import Image

    img_dir = os.path.join(tmp_path, "vg_images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(1)
    N, O, R = 5, 12, 8
    paths = []
    for i in range(N):
        fn = f"vg{i}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (40, 50, 3), dtype=np.uint8)).save(
            os.path.join(img_dir, fn))
        paths.append(fn)
    h5_path = os.path.join(tmp_path, "vg.h5")
    with h5py.File(h5_path, "w") as f:
        f.create_dataset("image_paths", data=[p.encode() for p in paths])
        f["object_names"] = rng.randint(1, 6, (N, O)).astype(np.int32)
        boxes = np.stack([
            rng.randint(0, 20, (N, O)), rng.randint(0, 15, (N, O)),
            rng.randint(5, 20, (N, O)), rng.randint(5, 15, (N, O))],
            axis=-1).astype(np.int32)
        f["object_boxes"] = boxes
        f["objects_per_image"] = np.full(N, O, np.int32)
        f["relationship_subjects"] = rng.randint(0, O, (N, R)).astype(np.int32)
        f["relationship_objects"] = rng.randint(0, O, (N, R)).astype(np.int32)
        f["relationship_predicates"] = rng.randint(1, 4, (N, R)).astype(
            np.int32)
        f["relationships_per_image"] = np.full(N, R, np.int32)
    vocab = {
        "object_idx_to_name": ["__image__"] + [f"o{i}" for i in range(1, 6)],
        "object_name_to_idx": {"__image__": 0,
                               **{f"o{i}": i for i in range(1, 6)}},
        "pred_idx_to_name": ["__in_image__", "p1", "p2", "p3"],
        "pred_name_to_idx": {"__in_image__": 0, "p1": 1, "p2": 2, "p3": 3},
    }
    return vocab, h5_path, img_dir


def test_vg_dataset_matches_reference(tmp_path, monkeypatch):
    _stub_torchvision(monkeypatch)
    vocab, h5_path, img_dir = _fake_vg(str(tmp_path))

    from sg2im.data.vg import VgSceneGraphDataset as RefVg

    kwargs = dict(vocab=vocab, h5_path=h5_path, image_dir=img_dir,
                  image_size=(32, 32), max_objects=6)
    ref = RefVg(**kwargs)
    # modern h5py returns bytes paths; the reference predates that
    ref.image_paths = [p.decode() if isinstance(p, bytes) else p
                       for p in ref.image_paths]
    mine = VgSceneGraphDataset(**kwargs)
    assert len(mine) == len(ref)
    for i in range(len(ref)):
        random.seed(7 + i)
        r_img, r_objs, r_boxes, r_triples = ref[i]
        random.seed(7 + i)
        s = mine[i]
        np.testing.assert_array_equal(s["objs"], r_objs.numpy())
        np.testing.assert_allclose(s["boxes"], r_boxes.numpy(), atol=1e-6)
        np.testing.assert_array_equal(s["triples"], r_triples.numpy())
        np.testing.assert_allclose(
            s["image"], r_img.permute(1, 2, 0).numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# Decoded-sample memmap cache (data/cache.py)
# ---------------------------------------------------------------------------

def test_coco_cache_bit_identical(tmp_path):
    """Cached and uncached samples must agree bit-for-bit for every epoch
    (the cache stores epoch-invariant decoded tensors; heuristic triples
    are re-synthesized per epoch from the cached geometry)."""
    img_dir, inst_path, stuff_path = _fake_coco(str(tmp_path))
    kwargs = dict(image_dir=img_dir, instances_json=inst_path,
                  stuff_json=stuff_path, image_size=(32, 32), mask_size=8,
                  seed=3)
    cache_dir = os.path.join(tmp_path, "cache")
    plain = CocoSceneGraphDataset(**kwargs)
    cached = CocoSceneGraphDataset(cache_dir=cache_dir, **kwargs)
    assert cached._cache is not None and cached._cache.ready
    for i in range(len(plain)):
        for epoch in (0, 1, 5):
            a = plain.getitem_at_epoch(i, epoch)
            b = cached.getitem_at_epoch(i, epoch)
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(
                    np.asarray(a[k]), np.asarray(b[k]), err_msg=k)

    # Re-construction must open the existing cache, not rebuild.
    import sg2im_tpu.data.cache as cache_mod
    orig_build = cache_mod.DecodedCache.build
    try:
        def boom(*a, **kw):
            raise AssertionError("cache rebuilt despite matching meta")
        cache_mod.DecodedCache.build = boom
        again = CocoSceneGraphDataset(cache_dir=cache_dir, **kwargs)
        assert again._cache.ready
    finally:
        cache_mod.DecodedCache.build = orig_build

    # A config change (different mask_size) must invalidate, not serve
    # stale tensors.
    other = CocoSceneGraphDataset(
        cache_dir=cache_dir, **dict(kwargs, mask_size=4))
    assert other[0]["masks"].shape[-1] == 4

    # No build residue: the atomic tmp-then-replace build must leave only
    # the final files.
    assert not [f for f in os.listdir(cache_dir) if ".tmp." in f]


def test_coco_cache_invalidates_on_filters_and_source(tmp_path):
    """The fingerprint must cover object-selection knobs and source-file
    identity: a changed filter (same n, same id endpoints) or a
    re-written annotations JSON may not serve stale decoded tensors."""
    import sg2im_tpu.data.cache as cache_mod

    img_dir, inst_path, stuff_path = _fake_coco(str(tmp_path))
    kwargs = dict(image_dir=img_dir, instances_json=inst_path,
                  stuff_json=stuff_path, image_size=(32, 32), mask_size=8,
                  seed=3)
    cache_dir = os.path.join(tmp_path, "cache")
    CocoSceneGraphDataset(cache_dir=cache_dir, **kwargs)

    builds = []
    orig_build = cache_mod.DecodedCache.build

    def counting_build(self, *a, **kw):
        builds.append(1)
        return orig_build(self, *a, **kw)

    cache_mod.DecodedCache.build = counting_build
    try:
        # Filter change: n and first/last image ids stay identical here,
        # but per-sample object sets could differ -> must rebuild.
        CocoSceneGraphDataset(
            cache_dir=cache_dir, **dict(kwargs, min_object_size=0.0001))
        assert builds, "filter change did not invalidate the cache"
        builds.clear()
        # Source rewrite at the same path (size/mtime change).
        with open(inst_path) as f:
            blob = f.read()
        with open(inst_path, "w") as f:
            f.write(blob + " ")
        CocoSceneGraphDataset(cache_dir=cache_dir, **kwargs)
        assert builds, "rewritten instances_json did not invalidate"
    finally:
        cache_mod.DecodedCache.build = orig_build


def test_coco_cache_bit_identical_native_fast(tmp_path):
    """Cached and uncached samples must also agree under the DCT-prescale
    decoder (whose bytes differ from PIL — the cache fingerprints it, so
    a fast-mode cache never serves exact-mode tensors or vice versa)."""
    from sg2im_tpu.data.decode import resolve_decoder

    if resolve_decoder("native_fast") != "native_fast":
        pytest.skip("native decoder unavailable")
    img_dir, inst_path, stuff_path = _fake_coco(str(tmp_path))
    kwargs = dict(image_dir=img_dir, instances_json=inst_path,
                  stuff_json=stuff_path, image_size=(32, 32), mask_size=8,
                  seed=3, decoder="native_fast")
    cache_dir = os.path.join(tmp_path, "cache")
    plain = CocoSceneGraphDataset(**kwargs)
    cached = CocoSceneGraphDataset(cache_dir=cache_dir, **kwargs)
    for i in range(len(plain)):
        a, b = plain.getitem_at_epoch(i, 1), cached.getitem_at_epoch(i, 1)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=k)
    # An exact-mode dataset pointed at the same cache dir must REBUILD
    # (fingerprint differs), not serve fast-mode bytes.
    import sg2im_tpu.data.cache as cache_mod

    called = {}
    orig_build = cache_mod.DecodedCache.build

    def spy(self, *a, **kw):
        called["rebuilt"] = True
        return orig_build(self, *a, **kw)

    try:
        cache_mod.DecodedCache.build = spy
        CocoSceneGraphDataset(cache_dir=cache_dir,
                              **{**kwargs, "decoder": "native"})
    finally:
        cache_mod.DecodedCache.build = orig_build
    assert called.get("rebuilt")


def test_cache_parallel_build_bit_identical(tmp_path):
    """The windowed thread-pool build (workers>1 — the default on real
    multi-core hosts; this container's cpu_count()=1 takes the sequential
    branch) must produce byte-identical cache files and preserve index
    order under out-of-order completion."""
    import time

    from sg2im_tpu.data.cache import DecodedCache

    rng = np.random.RandomState(0)
    images = [rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)
              for _ in range(37)]

    def decode(i):
        # Jitter so later indices can finish before earlier ones.
        time.sleep(0.001 * ((i * 7) % 5))
        return {"image": images[i], "objs": np.asarray([i % 5]),
                "boxes": np.asarray([[0.1, 0.1, 0.5, 0.5]], np.float32),
                "size": (8, 8)}

    files = {}
    for workers in (1, 4):
        d = os.path.join(tmp_path, f"w{workers}")
        cache = DecodedCache(d, {"fp": "x"})
        cache.build(len(images), decode, O_cap=2, workers=workers)
        files[workers] = {
            f: open(os.path.join(d, f), "rb").read()
            for f in sorted(os.listdir(d)) if not f.endswith(".json")}
        for i in (0, 17, 36):
            np.testing.assert_array_equal(cache.get(i)["image_u8"],
                                          images[i])
    assert files[1] == files[4]


def test_cache_empty_dataset_raises(tmp_path):
    from sg2im_tpu.data.cache import DecodedCache

    cache = DecodedCache(os.path.join(tmp_path, "c"), {"n": 0})
    with pytest.raises(ValueError, match="empty"):
        cache.build(0, lambda i: None)


def test_vg_cache_bit_identical(tmp_path):
    vocab, h5_path, img_dir = _fake_vg(str(tmp_path))
    kwargs = dict(vocab=vocab, h5_path=h5_path, image_dir=img_dir,
                  image_size=(32, 32), max_objects=6, seed=5)
    plain = VgSceneGraphDataset(**kwargs)
    cached = VgSceneGraphDataset(
        cache_dir=os.path.join(str(tmp_path), "vg_cache"), **kwargs)
    assert cached._cache is not None and cached._cache.ready
    for i in range(len(plain)):
        for epoch in (0, 2):
            a = plain.getitem_at_epoch(i, epoch)
            b = cached.getitem_at_epoch(i, epoch)
            for k in a:
                if a[k] is None:
                    assert b[k] is None
                else:
                    np.testing.assert_array_equal(
                        np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


# ---------------------------------------------------------------------------
# Padded loader
# ---------------------------------------------------------------------------

def test_padded_loader(tmp_path):
    img_dir, inst_path, stuff_path = _fake_coco(str(tmp_path))
    ds = CocoSceneGraphDataset(
        image_dir=img_dir, instances_json=inst_path, stuff_json=stuff_path,
        image_size=(32, 32), mask_size=8, seed=0)
    loader = PaddedLoader(ds, batch_size=2, O_max=8, T_max=12,
                          num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == len(ds) // 2
    b = batches[0]
    assert b["imgs"].shape == (2, 32, 32, 3)
    assert b["objs"].shape == (2, 8)
    assert b["masks"].shape == (2, 8, 8, 8)
    assert b["triples"].shape == (2, 12, 3)
    # 5 objects per image (3 instances + 1 stuff + __image__)
    assert b["obj_mask"].sum(axis=1).tolist() == [5.0, 5.0]
    # real triples reference only real object slots
    tm = b["triple_mask"].astype(bool)
    assert b["triples"][tm][:, [0, 2]].max() < 5


def test_collate_truncation():
    rng = np.random.RandomState(0)
    sample = {
        "image": np.zeros((8, 8, 3), np.float32),
        "objs": np.array([1, 2, 3, 4, 0]),
        "boxes": rng.rand(5, 4).astype(np.float32),
        "masks": None,
        "triples": np.array([[0, 1, 1], [3, 1, 2], [0, 0, 4]]),
    }
    sample = {k: v for k, v in sample.items() if v is not None}
    out = collate_padded([sample], O_max=4, T_max=4)
    # slots: 0,1,2 kept + __image__ (orig 4) remapped to 3
    np.testing.assert_array_equal(out["objs"][0], [1, 2, 3, 0])
    kept = out["triples"][0][out["triple_mask"][0].astype(bool)]
    np.testing.assert_array_equal(kept, [[0, 1, 1], [0, 0, 3]])


def test_loader_sharding(tmp_path):
    img_dir, inst_path, stuff_path = _fake_coco(str(tmp_path))
    ds = CocoSceneGraphDataset(
        image_dir=img_dir, instances_json=inst_path, stuff_json=stuff_path,
        image_size=(16, 16), mask_size=8, seed=0)
    full = PaddedLoader(ds, batch_size=1, O_max=8, T_max=12,
                        num_workers=1, seed=0, shuffle=True)
    shards = [PaddedLoader(ds, batch_size=1, O_max=8, T_max=12,
                           num_workers=1, seed=0, shuffle=True,
                           shard=(k, 2)) for k in range(2)]
    all_imgs = np.concatenate([b["imgs"] for b in full])
    shard_imgs = np.concatenate(
        [b["imgs"] for loader in shards for b in loader])
    # Disjoint cover: every sample appears exactly once across shards.
    assert shard_imgs.shape == all_imgs.shape
    sums_full = sorted(np.abs(all_imgs).sum(axis=(1, 2, 3)).tolist())
    sums_shard = sorted(np.abs(shard_imgs).sum(axis=(1, 2, 3)).tolist())
    np.testing.assert_allclose(sums_shard, sums_full, rtol=1e-6)


def test_loader_deterministic_across_workers(tmp_path):
    """Seeded datasets must yield identical epochs for any num_workers
    (per-sample RNG keyed on (seed, epoch, index) — VERDICT weak #5: the
    reference's global-RNG draw made num_workers>1 non-reproducible)."""
    img_dir, inst_path, stuff_path = _fake_coco(str(tmp_path))

    def epoch_batches(num_workers):
        ds = CocoSceneGraphDataset(
            image_dir=img_dir, instances_json=inst_path,
            stuff_json=stuff_path, image_size=(16, 16), mask_size=8, seed=5)
        loader = PaddedLoader(ds, batch_size=2, O_max=8, T_max=12,
                              num_workers=num_workers, seed=5, shuffle=True)
        return [list(loader) for _ in range(2)]  # two epochs

    a, b = epoch_batches(1), epoch_batches(4)
    for ep_a, ep_b in zip(a, b):
        assert len(ep_a) == len(ep_b)
        for ba, bb in zip(ep_a, ep_b):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)
    # epochs re-roll the heuristic triples (not a frozen stream)
    ep1, ep2 = a
    assert any(not np.array_equal(x["triples"], y["triples"])
               for x, y in zip(ep1, ep2))


def test_loader_epoch_bound_per_iterator(tmp_path):
    """A second iterator (a mid-epoch eval sweep, cli/train.py checkpoint
    path) must not perturb a live iterator's in-flight samples: the epoch
    is bound per iterator via getitem_at_epoch, not shared dataset state."""
    img_dir, inst_path, stuff_path = _fake_coco(str(tmp_path))

    def make_loader():
        ds = CocoSceneGraphDataset(
            image_dir=img_dir, instances_json=inst_path,
            stuff_json=stuff_path, image_size=(16, 16), mask_size=8, seed=5)
        return PaddedLoader(ds, batch_size=2, O_max=8, T_max=12,
                            num_workers=2, seed=5, shuffle=True)

    # Clean run: one full epoch, no interference.
    clean = list(make_loader())

    # Interfered run: start the epoch, then spin up (and drain) a second
    # iterator mid-epoch before consuming the rest.
    loader = make_loader()
    it = iter(loader)
    got = [next(it)]
    list(iter(loader))  # the "eval sweep"
    got.extend(it)

    assert len(got) == len(clean)
    for ba, bb in zip(got, clean):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


def test_flat_to_padded_unsorted_and_none_masks():
    """flat_to_padded must remap triple endpoints via a global->local slot
    map (a cumulative offset is wrong for unsorted obj_to_img), and
    pad_graphs must tolerate a None FIRST mask entry."""
    from sg2im_tpu.data.batching import flat_to_padded, pad_graphs

    objs = np.asarray([10, 20, 30], np.int64)        # images [1, 0, 1]
    obj_to_img = np.asarray([1, 0, 1])
    triples = np.asarray([[0, 5, 2]])                # both in image 1
    batch = flat_to_padded(objs, triples, obj_to_img)
    np.testing.assert_array_equal(batch.objs[0, :1], [20])
    np.testing.assert_array_equal(batch.objs[1, :2], [10, 30])
    # Image-1 triple: global 0 -> local 0, global 2 -> local 1.
    np.testing.assert_array_equal(batch.triples[1, 0], [0, 5, 1])
    assert batch.triple_mask[1, 0] and not batch.triple_mask[0].any()

    gb = pad_graphs([[1], [2]], [np.zeros((0, 3))] * 2,
                    masks_list=[None, np.ones((1, 4, 4))])
    assert gb.masks is not None and gb.masks.shape[-2:] == (4, 4)
    assert gb.masks[0].sum() == 0 and gb.masks[1, 0].sum() == 16


def test_check_model_empty_loader_returns_gracefully():
    """return_samples=True with zero swept batches (num_val_samples <
    batch_size under drop_last) must not crash at the first checkpoint."""
    from sg2im_tpu.train.config import TrainConfig
    from sg2im_tpu.train.trainer import Trainer

    vocab = {"object_idx_to_name": [f"o{i}" for i in range(7)],
             "pred_idx_to_name": [f"p{i}" for i in range(3)]}
    config = TrainConfig(dataset="coco", batch_size=2, image_size=(16, 16),
                         pad_objects_to=4, pad_triples_to=6, mask_size=0,
                         layout_noise_dim=4,
                         refinement_network_dims=(16, 8))
    trainer = Trainer(config, vocab)
    state = trainer.init_state(seed=0)
    losses, samples, batch_data, iou = trainer.check_model(
        state, iter(()), return_samples=True)
    assert losses == {} and samples == {} and batch_data == {}
    assert iou == 0.0


def test_coco_no_relationships(tmp_path):
    """include_relationships=False -> only __in_image__ triples (the
    no_relations ablation's data path, reference coco.py:323)."""
    img_dir, inst_path, stuff_path = _fake_coco(str(tmp_path))
    ds = CocoSceneGraphDataset(
        image_dir=img_dir, instances_json=inst_path, stuff_json=stuff_path,
        image_size=(16, 16), mask_size=8, include_relationships=False,
        seed=0)
    s = ds[0]
    in_image = ds.vocab["pred_name_to_idx"]["__in_image__"]
    assert (s["triples"][:, 1] == in_image).all()
    assert len(s["triples"]) == len(s["objs"]) - 1


def test_loader_propagates_worker_exceptions(tmp_path):
    """A failing __getitem__ must raise in the consumer, not hang."""
    img_dir, inst_path, stuff_path = _fake_coco(str(tmp_path))
    ds = CocoSceneGraphDataset(
        image_dir=img_dir, instances_json=inst_path, stuff_json=stuff_path,
        image_size=(16, 16), mask_size=8, seed=0)
    # sabotage one image file
    victim = os.path.join(img_dir, os.listdir(img_dir)[0])
    os.remove(victim)
    loader = PaddedLoader(ds, batch_size=2, O_max=8, T_max=12,
                          num_workers=2, seed=0)
    with pytest.raises(FileNotFoundError):
        list(loader)

"""preprocess_vg parity: run both the reference script and our port on a
synthetic raw-VG fixture and require identical HDF5 + vocab outputs."""

import importlib.util
import json
import os
import sys

import h5py
import numpy as np


def _fake_raw_vg(tmp_path):
    rng = np.random.RandomState(0)
    n_images = 8
    images, objects, attributes, relationships = [], [], [], []
    splits = {"train": [], "val": [], "test": []}
    oid = 1
    rid = 1
    names_pool = ["sky", "tree", "man", "dog", "grass"]
    preds_pool = ["on", "near", "behind"]
    attrs_pool = ["green", "tall", "small"]
    for i in range(n_images):
        image_id = 10 + i
        images.append({"image_id": image_id, "height": 300, "width": 400,
                       "url": f"https://host/VG_100K/{image_id}.jpg"})
        splits[["train", "train", "train", "train", "train", "train",
                "val", "test"][i]].append(image_id)
        objs = []
        obj_ids = []
        for j in range(4):
            name = names_pool[(i + j) % len(names_pool)]
            objs.append({
                "object_id": oid, "names": [name],
                "x": int(rng.randint(0, 100)), "y": int(rng.randint(0, 100)),
                "w": int(rng.randint(40, 120)),
                "h": int(rng.randint(40, 120)),
            })
            obj_ids.append(oid)
            oid += 1
        objects.append({"image_id": image_id, "objects": objs})
        attributes.append({
            "image_id": image_id,
            "attributes": [
                {"object_id": obj_ids[0],
                 "attributes": [attrs_pool[i % 3]]},
                {"object_id": obj_ids[1]},
            ],
        })
        rels = []
        for k in range(3):
            rels.append({
                "relationship_id": rid,
                "predicate": preds_pool[(i + k) % 3].upper(),  # alias test
                "subject": {"object_id": obj_ids[k]},
                "object": {"object_id": obj_ids[(k + 1) % 4]},
            })
            rid += 1
        relationships.append({"image_id": image_id, "relationships": rels})

    paths = {}
    for name, data in [("image_data", images), ("objects", objects),
                       ("attributes", attributes),
                       ("relationships", relationships),
                       ("splits", splits)]:
        path = os.path.join(tmp_path, f"{name}.json")
        with open(path, "w") as f:
            json.dump(data, f)
        paths[name] = path
    # alias files: map upper-case predicates to lower
    obj_alias = os.path.join(tmp_path, "object_alias.txt")
    with open(obj_alias, "w") as f:
        f.write("man,person\n")
    rel_alias = os.path.join(tmp_path, "relationship_alias.txt")
    with open(rel_alias, "w") as f:
        f.write("on,ON\nnear,NEAR\nbehind,BEHIND\n")
    paths["object_alias"] = obj_alias
    paths["relationship_alias"] = rel_alias
    return paths


def _flags(paths, out_dir):
    return [
        "--splits_json", paths["splits"],
        "--images_json", paths["image_data"],
        "--objects_json", paths["objects"],
        "--attributes_json", paths["attributes"],
        "--object_aliases", paths["object_alias"],
        "--relationship_aliases", paths["relationship_alias"],
        "--relationships_json", paths["relationships"],
        "--min_image_size", "10",
        "--min_object_instances", "2",
        "--min_attribute_instances", "1",
        "--min_object_size", "16",
        "--min_objects_per_image", "2",
        "--max_objects_per_image", "5",
        "--min_relationship_instances", "1",
        "--max_relationships_per_image", "5",
        "--output_vocab_json", os.path.join(out_dir, "vocab.json"),
        "--output_h5_dir", out_dir,
    ]


def _run_reference(paths, out_dir):
    # The reference imports (but never uses for h5 output) scipy.misc
    # imread/imresize, removed from modern scipy — stub them.
    import types

    misc = types.ModuleType("scipy.misc")
    misc.imread = lambda *a, **k: None
    misc.imresize = lambda *a, **k: None
    sys.modules.setdefault("scipy", types.ModuleType("scipy"))
    sys.modules["scipy.misc"] = misc
    sys.modules["scipy"].misc = misc

    spec = importlib.util.spec_from_file_location(
        "ref_preprocess_vg", "/root/reference/scripts/preprocess_vg.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    args = mod.parser.parse_args(_flags(paths, out_dir))
    mod.main(args)


def test_preprocess_vg_parity(tmp_path):
    paths = _fake_raw_vg(str(tmp_path))
    ref_out = os.path.join(tmp_path, "ref_out")
    my_out = os.path.join(tmp_path, "my_out")
    os.makedirs(ref_out)
    os.makedirs(my_out)

    _run_reference(paths, ref_out)

    from sg2im_tpu.cli.preprocess_vg import main

    assert main(_flags(paths, my_out)) == 0

    with open(os.path.join(ref_out, "vocab.json")) as f:
        ref_vocab = json.load(f)
    with open(os.path.join(my_out, "vocab.json")) as f:
        my_vocab = json.load(f)
    assert my_vocab == ref_vocab

    for split in ("train", "val", "test"):
        ref_h5 = h5py.File(os.path.join(ref_out, f"{split}.h5"), "r")
        my_h5 = h5py.File(os.path.join(my_out, f"{split}.h5"), "r")
        assert set(ref_h5.keys()) == set(my_h5.keys()) | {"relationship_ids"} \
            or set(ref_h5.keys()) == set(my_h5.keys())
        for k in my_h5.keys():
            if k == "image_paths":
                ref_paths = [p.decode() if isinstance(p, bytes) else p
                             for p in ref_h5[k]]
                my_paths = [p.decode() if isinstance(p, bytes) else p
                            for p in my_h5[k]]
                assert my_paths == ref_paths
            else:
                np.testing.assert_array_equal(np.asarray(my_h5[k]),
                                              np.asarray(ref_h5[k]), err_msg=k)
        ref_h5.close()
        my_h5.close()

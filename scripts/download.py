#!/usr/bin/env python3
"""Download datasets and pretrained reference models.

One CLI replacing the reference's five shell scripts
(``scripts/download_{coco,vg,models,ablated_models,full_models}.sh``) —
same artifact URLs, resumable, with unzip.

Usage:
    python scripts/download.py models            # coco64/vg64/vg128 (small)
    python scripts/download.py ablated_models    # 12 ablated variants
    python scripts/download.py full_models       # with-history checkpoints
    python scripts/download.py coco              # COCO 2017 + stuff
    python scripts/download.py vg                # Visual Genome v1.4
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import zipfile

MODELS_SMALL = ["coco64.pt", "vg64.pt", "vg128.pt"]
ABLATED = [
    "coco64_no_gconv.pt", "coco64_no_relations.pt",
    "coco64_no_discriminators.pt", "coco64_no_obj_discriminator.pt",
    "coco64_no_img_discriminator.pt", "coco64_gt_layout.pt",
    "coco64_gt_layout_no_gconv.pt",
    "vg64_no_gconv.pt", "vg64_no_relations.pt", "vg64_no_discriminators.pt",
    "vg64_no_obj_discriminator.pt", "vg64_no_img_discriminator.pt",
]
SG2IM_DATA = "https://storage.googleapis.com/sg2im-data"
COCO_URLS = [
    "http://images.cocodataset.org/zips/train2017.zip",
    "http://images.cocodataset.org/zips/val2017.zip",
    "http://images.cocodataset.org/annotations/annotations_trainval2017.zip",
    "http://images.cocodataset.org/annotations/"
    "stuff_annotations_trainval2017.zip",
]
VG_URLS = [
    "https://visualgenome.org/static/data/dataset/objects.json.zip",
    "https://visualgenome.org/static/data/dataset/attributes.json.zip",
    "https://visualgenome.org/static/data/dataset/relationships.json.zip",
    "https://visualgenome.org/static/data/dataset/object_alias.txt",
    "https://visualgenome.org/static/data/dataset/relationship_alias.txt",
    "https://visualgenome.org/static/data/dataset/image_data.json.zip",
    "https://cs.stanford.edu/people/rak248/VG_100K_2/images.zip",
    "https://cs.stanford.edu/people/rak248/VG_100K_2/images2.zip",
]


def fetch(url: str, dest: str):
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    if os.path.exists(dest):
        print(f"exists, skipping: {dest}")
        return dest
    print(f"fetching {url} -> {dest}")
    subprocess.run(["wget", "-c", url, "-O", dest + ".part"], check=True)
    os.rename(dest + ".part", dest)
    return dest


def unzip(path: str, dest_dir: str):
    print(f"unzipping {path}")
    with zipfile.ZipFile(path) as z:
        z.extractall(dest_dir)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("what", choices=["models", "ablated_models", "full_models",
                                    "coco", "vg"])
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    if args.what == "models":
        out = args.out or "sg2im-models"
        for m in MODELS_SMALL:
            fetch(f"{SG2IM_DATA}/small/{m}", os.path.join(out, m))
    elif args.what == "ablated_models":
        out = args.out or "sg2im-models/ablated"
        for m in ABLATED:
            fetch(f"{SG2IM_DATA}/small/{m}", os.path.join(out, m))
    elif args.what == "full_models":
        out = args.out or "sg2im-models/full"
        for m in MODELS_SMALL + ABLATED:
            fetch(f"{SG2IM_DATA}/full/{m}", os.path.join(out, m))
    elif args.what == "coco":
        out = args.out or "datasets/coco"
        for url in COCO_URLS:
            z = fetch(url, os.path.join(out, os.path.basename(url)))
            unzip(z, out if "annotations" in url
                  else os.path.join(out, "images"))
    elif args.what == "vg":
        out = args.out or "datasets/vg"
        for url in VG_URLS:
            dest = os.path.join(out, os.path.basename(url))
            fetch(url, dest)
            if dest.endswith(".zip"):
                unzip(dest, os.path.join(out, "images")
                      if "VG_100K" in url else out)
    return 0


if __name__ == "__main__":
    sys.exit(main())

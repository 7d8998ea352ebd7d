"""BUTD TSV -> per-image H5 conversion (reference
data/preprocess/gqa/tsv2h5.py:31-79 / vqa/tsv2h5.py).

Filters TSV rows to the img_ids referenced by a question split, writes
per-image groups (objects_id/objects_conf/attrs_id/attrs_conf/boxes/features)
plus the {split}_obj36_info.json sidecar.

    python tools/tsv2h5.py --tsv gqa_testdev_obj36.tsv \
        --questions data/gqa_ood/testdev_tail.json \
        --out data/gqa_imgfeat/testdev_tail_obj36.h5 [--img_key img_id]
"""
from __future__ import annotations

import argparse

import numpy as np

from xggm_tpu.data.pretrain_data import load_obj_tsv
from xggm_tpu.utils.io import load_json, save_json


def tsv_to_h5(tsv_file: str, img_ids, out_h5: str, info_json: str) -> int:
    import h5py

    img_ids = set(img_ids)
    info = []
    n = 0
    with h5py.File(out_h5, "w") as h5:
        for item in load_obj_tsv(tsv_file):
            if item["img_id"] not in img_ids:
                continue
            g = h5.create_group(str(item["img_id"]))
            for key in ("objects_id", "objects_conf", "attrs_id",
                        "attrs_conf", "boxes", "features"):
                g.create_dataset(key, data=np.asarray(item[key]))
            info.append({"img_id": item["img_id"], "img_h": item["img_h"],
                         "img_w": item["img_w"],
                         "num_boxes": item["num_boxes"]})
            n += 1
    save_json(info, info_json)
    return n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", required=True)
    p.add_argument("--questions", required=True,
                   help="question json naming the split's img ids")
    p.add_argument("--out", required=True, help="output .h5 path")
    p.add_argument("--img_key", default="img_id",
                   help="img id key in the question json (image_id for VQA)")
    args = p.parse_args(argv)
    targets = load_json(args.questions)
    img_ids = {t[args.img_key] for t in targets}
    info_json = args.out.replace(".h5", "_info.json")
    n = tsv_to_h5(args.tsv, img_ids, args.out, info_json)
    print(f"wrote {n} images to {args.out} (+ {info_json})")


if __name__ == "__main__":
    main()

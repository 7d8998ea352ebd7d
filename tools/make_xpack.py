"""Convert reference-format obj36 H5 feature files into xpack binary caches.

    python tools/make_xpack.py --obj data/gqa_imgfeat/train_obj36.h5 \
        --info data/gqa_imgfeat/train_obj36_info.json \
        --adj data/gqa_imgfeat/train_obj36_adj_v2.h5 \
        --out data/gqa_imgfeat/train_obj36.xpack
"""
from __future__ import annotations

import argparse

from xggm_tpu.data.xpack import convert_h5_to_xpack


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--obj", required=True)
    p.add_argument("--info", required=True)
    p.add_argument("--adj", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--feat_dim", type=int, default=2048)
    args = p.parse_args(argv)
    path = convert_h5_to_xpack(args.obj, args.info, args.adj, args.out,
                               args.feat_dim)
    print(f"wrote {path} (+ .index.json)")


if __name__ == "__main__":
    main()

"""Native packed loader: H5 -> xpack conversion, native/mmap gather parity,
async prefetch, and store integration with the dataset."""
import os

import numpy as np
import pytest

from xggm_tpu.config import DataConfig
from xggm_tpu.data.datasets import GQADataset, GraphBatchDataset
from xggm_tpu.data.synthetic import make_synthetic_gqa, write_vocab
from xggm_tpu.data.tokenizer import BertTokenizer
from xggm_tpu.data.xpack import (
    XPack, XPackFeatureStore, convert_h5_to_xpack, ensure_native,
)


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("xp"))
    make_synthetic_gqa(root, "train", n_images=10, n_questions=20, feat_dim=64)
    feat = os.path.join(root, "gqa_imgfeat")
    pack_path = os.path.join(root, "train_obj36.xpack")
    convert_h5_to_xpack(
        os.path.join(feat, "train_obj36.h5"),
        os.path.join(feat, "train_obj36_info.json"),
        os.path.join(feat, "train_obj36_adj_v2.h5"),
        pack_path, feat_dim=64)
    write_vocab(os.path.join(root, "vocab.txt"))
    return root, pack_path


def test_native_library_builds():
    assert ensure_native() is not None, "libxpack.so failed to build/load"


def test_gather_matches_h5(packed):
    root, pack_path = packed
    import h5py

    pack = XPack(pack_path)
    assert pack.native
    rows = [3, 0, 7, 7, 1]
    rec = pack.unpack(pack.gather_rows(rows))
    obj = h5py.File(os.path.join(root, "gqa_imgfeat", "train_obj36.h5"), "r")
    adj = h5py.File(os.path.join(root, "gqa_imgfeat",
                                 "train_obj36_adj_v2.h5"), "r")
    for k, r in enumerate(rows):
        img_id = pack.img_ids[r]
        np.testing.assert_array_equal(rec["feats"][k],
                                      np.asarray(obj[img_id]["features"]))
        np.testing.assert_array_equal(rec["adj"][k],
                                      np.asarray(adj[img_id]))
        assert rec["boxes"][k].max() <= 1 + 1e-5  # pre-normalized
    pack.close()


def test_async_prefetch(packed):
    _, pack_path = packed
    pack = XPack(pack_path)
    job, out = pack.submit([1, 2, 3])
    pack.wait(job)
    sync = pack.gather_rows([1, 2, 3])
    np.testing.assert_array_equal(out, sync)
    pack.close()


def test_store_in_dataset(packed):
    root, pack_path = packed
    cfg = DataConfig(data_root=root)
    dset = GQADataset("train", cfg)
    tok = BertTokenizer.from_file(os.path.join(root, "vocab.txt"))
    gbd_h5 = GraphBatchDataset(dset, tok)
    gbd_xp = GraphBatchDataset(dset, tok, store=XPackFeatureStore(pack_path))
    b1 = gbd_h5.get_batch([0, 1, 2])
    b2 = gbd_xp.get_batch([0, 1, 2])
    for k in ("feats", "adj", "input_ids", "target"):
        np.testing.assert_allclose(b1[k], b2[k], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(b1["boxes"], b2["boxes"], rtol=1e-5, atol=1e-6)

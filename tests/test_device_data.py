"""Device-resident tables: gathers match the host iterators."""

import numpy as np
import pytest

from image_captioning_through_rl_tpu.data import (
    DeviceCocoTables,
    load_data,
    make_synthetic_coco,
)
from image_captioning_through_rl_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = make_synthetic_coco(str(tmp_path_factory.mktemp("coco")), seed=3)
    return load_data(d)


def test_gather_matches_host_indexing(data):
    tables = DeviceCocoTables(data, split="train")
    mask = np.array([3, 0, 7, 3, 11])
    caps_b, feats_b = tables.gather(mask)
    np.testing.assert_array_equal(np.asarray(caps_b), data.train_captions[mask])
    np.testing.assert_array_equal(
        np.asarray(feats_b), data.train_features[data.train_image_idxs[mask]]
    )


def test_minibatches_cover_epoch(data):
    tables = DeviceCocoTables(data, split="train")
    rng = np.random.default_rng(0)
    seen = 0
    for caps_b, feats_b in tables.minibatches(16, rng=rng):
        assert caps_b.shape[0] == feats_b.shape[0]
        seen += caps_b.shape[0]
    assert seen == data.train_captions.shape[0]


def test_sharded_gather(data):
    mesh = make_mesh((8,), ("data",))
    tables = DeviceCocoTables(data, split="train", mesh=mesh)
    mask = np.arange(16)
    caps_b, feats_b = tables.gather(mask)
    np.testing.assert_array_equal(np.asarray(caps_b), data.train_captions[:16])
    # batch axis sharded over the mesh
    assert "data" in str(caps_b.sharding.spec)


def test_sharded_gather_ragged_batch_replicates(data):
    """A batch not divisible by the data-axis size (ragged epoch tail)
    must not crash the sharded device_put — it replicates instead, and
    the epoch iterator completes."""
    mesh = make_mesh((8,), ("data",))
    tables = DeviceCocoTables(data, split="train", mesh=mesh)
    mask = np.arange(10)  # 10 % 8 != 0
    caps_b, _ = tables.gather(mask)
    np.testing.assert_array_equal(np.asarray(caps_b), data.train_captions[:10])
    assert "data" not in str(caps_b.sharding.spec)  # replicated fallback
    rng = np.random.default_rng(0)
    n = sum(c.shape[0] for c, _ in tables.minibatches(16, rng=rng))
    assert n == tables.num_captions  # ragged tail included, no crash


def test_device_tables_on_mesh_without_data_axis(data):
    """A model-only mesh must fall back to the replicated layout, not
    KeyError on the absent data axis (review round-3 regression)."""
    mesh = make_mesh((8,), ("model",))
    tables = DeviceCocoTables(data, split="train", mesh=mesh)
    caps_b, feats_b = tables.gather(np.arange(6))
    assert caps_b.shape[0] == 6 and feats_b.shape[0] == 6

"""Data runtime tests: synthetic gen, .inter round-trip, bundles, sampling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommendar_systems_tpu.data.arrays import build_data_bundle
from recommendar_systems_tpu.data.dataset import load_dataset
from recommendar_systems_tpu.data.sampling import csr_membership, sample_negatives
from recommendar_systems_tpu.data.synthetic import generate_synthetic, write_dataset_files
from recommendar_systems_tpu.utils.configurator import Config


def test_synthetic_shapes(small_ds):
    assert small_ds.n_users > 0 and small_ds.n_items > 0
    assert len(small_ds.train["users"]) > len(small_ds.valid["users"])
    assert small_ds.v_feat.shape == (small_ds.n_items, 24)
    # every valid/test user appears in train (cold-start filter)
    train_users = set(small_ds.train["users"].tolist())
    for split in ("valid", "test"):
        assert set(small_ds.splits[split]["users"].tolist()) <= train_users


def test_inter_file_roundtrip(tmp_path, small_ds):
    out = tmp_path / "synthetic"
    write_dataset_files(small_ds, str(out))
    cfg = Config("VBPR", "synthetic", config_dict={"data_path": str(tmp_path) + "/"})
    ds2 = load_dataset(cfg)
    assert ds2.n_users == small_ds.n_users
    assert ds2.n_items == small_ds.n_items
    assert len(ds2.train["users"]) == len(small_ds.train["users"])
    np.testing.assert_array_equal(np.sort(ds2.train["items"]), np.sort(small_ds.train["items"]))


def test_pos_csr(small_bundle, small_ds):
    b = small_bundle
    indptr = np.asarray(b.pos_indptr)
    items = np.asarray(b.pos_items)
    # CSR covers exactly the train interactions
    assert indptr[-1] == len(small_ds.train["users"])
    u0 = int(small_ds.train["users"][0])
    row = items[indptr[u0] : indptr[u0 + 1]]
    expected = np.sort(small_ds.train["items"][small_ds.train["users"] == u0])
    np.testing.assert_array_equal(row, expected)
    assert np.all(np.diff(row) > 0)  # strictly sorted, no dups


def test_csr_membership(small_bundle):
    b = small_bundle
    indptr = np.asarray(b.pos_indptr)
    items = np.asarray(b.pos_items)
    rng = np.random.default_rng(3)
    users = rng.integers(0, b.n_users, size=200).astype(np.int32)
    cands = rng.integers(0, b.n_items, size=200).astype(np.int32)
    got = np.asarray(
        csr_membership(b.pos_indptr, b.pos_items, jnp.asarray(users), jnp.asarray(cands))
    )
    for k in range(200):
        seg = items[indptr[users[k]] : indptr[users[k] + 1]]
        assert got[k] == (cands[k] in seg), (users[k], cands[k])


def test_negative_sampling_validity(small_bundle):
    b = small_bundle
    users = b.train_users[:256]
    neg = sample_negatives(
        jax.random.key(0), users, b.n_items, b.pos_indptr, b.pos_items
    )
    neg = np.asarray(neg)
    users_np = np.asarray(users)
    indptr = np.asarray(b.pos_indptr)
    items = np.asarray(b.pos_items)
    bad = 0
    for k in range(len(users_np)):
        seg = items[indptr[users_np[k]] : indptr[users_np[k] + 1]]
        if neg[k] in seg:
            bad += 1
    assert bad == 0
    # uniform-ish coverage
    assert len(np.unique(neg)) > 10


def test_eval_bundle_masks(small_bundle, small_ds):
    b = small_bundle
    ev = b.valid_eval
    assert ev.n_eval == len(np.unique(small_ds.valid["users"]))
    # mask items of batch 0 are the train positives of those users
    users0 = np.asarray(ev.users[0])[: ev.n_valid[0]]
    rows = np.asarray(ev.mask_rows[0])
    items = np.asarray(ev.mask_items[0])
    real = items < b.n_items
    indptr = np.asarray(b.pos_indptr)
    pos_sorted = np.asarray(b.pos_items)
    for local_u in np.unique(rows[real]):
        u = users0[local_u]
        expected = pos_sorted[indptr[u] : indptr[u + 1]]
        got = np.sort(items[real][rows[real] == local_u])
        np.testing.assert_array_equal(got, np.sort(expected))

"""Grain pipeline parity with ArrayLoader."""

import numpy as np
import pytest

from creamfl_tpu.data.grain_loaders import (HAVE_GRAIN, GrainLoader,
                                            make_loader)
from creamfl_tpu.data.loaders import ArrayLoader
from creamfl_tpu.data.synthetic import SyntheticTextClassification

pytestmark = pytest.mark.skipif(not HAVE_GRAIN, reason="grain missing")


def test_grain_loader_covers_dataset_once():
    ds = SyntheticTextClassification(n=10)
    ld = GrainLoader(ds, batch_size=4, shuffle=False)
    batches = list(ld)
    assert len(batches) == len(ld) == 3
    labels = np.concatenate([b["labels"][b["valid"]] for b in batches])
    np.testing.assert_array_equal(labels, ds.targets.astype(np.int32))
    # Final batch repeat-padded with valid mask.
    assert batches[-1]["captions"].shape == (4, 16)
    assert batches[-1]["valid"].tolist() == [True, True, False, False]


def test_grain_shuffle_reseeds_per_epoch():
    ds = SyntheticTextClassification(n=16)
    ld = GrainLoader(ds, batch_size=8, shuffle=True, seed=0)
    e1 = [b["labels"].tolist() for b in ld]
    e2 = [b["labels"].tolist() for b in ld]
    assert e1 != e2


def test_make_loader_backend_switch():
    ds = SyntheticTextClassification(n=8)
    assert isinstance(make_loader(ds, 4, backend="array"), ArrayLoader)
    assert isinstance(make_loader(ds, 4, backend="grain"), GrainLoader)

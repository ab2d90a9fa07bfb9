"""Native C++ CSV loader tests."""

import glob

import numpy as np
import pandas as pd
import pytest

from defensive_model_vae_tpu.data.csv_io import (
    native_available,
    read_csv,
    read_csv_native,
)

from conftest import REFERENCE_ROOT, requires_reference


def test_native_loader_builds():
    assert native_available(), "g++ toolchain should build the loader here"


def test_native_parses_synthetic(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b,c\n1,2.5,-3e2\n,nan,7\n4,5,6\n")
    names, data = read_csv_native(str(p))
    assert names == ["a", "b", "c"]
    assert data.shape == (3, 3)
    assert data[0, 2] == -300.0
    assert np.isnan(data[1, 0]) and np.isnan(data[1, 1]) and data[1, 2] == 7

    df = read_csv(str(p))
    ref = pd.read_csv(str(p))
    assert list(df.columns) == list(ref.columns)


def test_native_plus_sign_matches_pandas(tmp_path):
    """from_chars rejects a leading '+' that pandas accepts — the loader
    strips it so both parsers agree; '+-1.5'-style garbage stays NaN on
    both paths."""
    p = tmp_path / "plus.csv"
    p.write_text("a,b,c\n+1.5,+.25,+3e2\n+-1.5,++2,+\n+inf,+nan,-inf\n")
    _, data = read_csv_native(str(p))
    ref = pd.read_csv(str(p)).apply(pd.to_numeric, errors="coerce").to_numpy(float)
    assert np.allclose(data, ref, equal_nan=True), (data, ref)
    assert data[0].tolist() == [1.5, 0.25, 300.0]
    assert np.isnan(data[1]).all()
    # '+inf'/'+nan' parse like pandas does (the '+' strip also covers the
    # word forms, not just digits)
    assert data[2, 0] == np.inf and np.isnan(data[2, 1]) and data[2, 2] == -np.inf


@requires_reference
def test_native_parity_on_real_corpus_sample():
    csvs = sorted(glob.glob(str(REFERENCE_ROOT / "DefensiveData/*/*/*.csv")))
    assert len(csvs) > 200
    for p in csvs[::41]:
        mine = read_csv(p)
        ref = pd.read_csv(p)
        assert list(mine.columns) == list(ref.columns), p
        a, b = mine.to_numpy(float), ref.to_numpy(float)
        assert np.allclose(a, b, equal_nan=True), p

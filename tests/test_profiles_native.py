"""Native profile-CSV reader vs pandas oracle + malformed-input behavior."""

import numpy as np
import pandas as pd
import pytest

from lesionvae_tpu.io import profiles_native


pytestmark = pytest.mark.skipif(not profiles_native.available(),
                                reason="native CSV parser unavailable")


def test_matches_pandas(tmp_path):
    rng = np.random.default_rng(0)
    n = 50
    df = pd.DataFrame({
        "tract_id": ["a"] * 20 + ["b"] * 25 + ["a"] * 5,  # a reappears
        "streamline_id": np.arange(n),
        "f1": rng.normal(size=n).astype(np.float32),
        "f2": rng.normal(size=n).astype(np.float32) * 1e-7,
        "f3": rng.normal(size=n).astype(np.float32) * 1e6,
    })
    df.loc[3, "f1"] = np.nan
    df.loc[4, "f2"] = np.inf
    df.loc[5, "f3"] = -np.inf
    fp = tmp_path / "p.csv"
    df.to_csv(fp, index=False)

    vals, starts, names, present = profiles_native.read_profile_columns(
        fp, ["f1", "f2", "f3", "absent_col"])
    assert present.tolist() == [True, True, True, False]
    assert np.isnan(vals[:, 3]).all()
    for j, c in enumerate(["f1", "f2", "f3"]):
        np.testing.assert_allclose(
            vals[:, j], df[c].to_numpy(np.float32), rtol=1e-6, atol=1e-30,
            equal_nan=True, err_msg=c)
    np.testing.assert_array_equal(starts, [0, 20, 45])
    assert names == ["a", "b", "a"]


def test_crlf_and_no_trailing_newline(tmp_path):
    fp = tmp_path / "p.csv"
    fp.write_bytes(b"tract_id,f1\r\nx,1.5\r\ny,-2.25e1")
    vals, starts, names, _ = profiles_native.read_profile_columns(fp, ["f1"])
    np.testing.assert_allclose(vals[:, 0], [1.5, -22.5])
    assert names == ["x", "y"]


def test_short_rows_and_junk_fields(tmp_path):
    fp = tmp_path / "p.csv"
    fp.write_text("tract_id,f1,f2\na,1.0,2.0\na,3.0\nb,notanum,4.0\n")
    vals, starts, names, _ = profiles_native.read_profile_columns(
        fp, ["f1", "f2"])
    np.testing.assert_allclose(vals[0], [1.0, 2.0])
    assert vals[1, 0] == 3.0 and np.isnan(vals[1, 1])
    assert np.isnan(vals[2, 0]) and vals[2, 1] == 4.0


def test_malformed_inputs(tmp_path):
    fp = tmp_path / "empty.csv"
    fp.write_text("")
    with pytest.raises(ValueError):
        profiles_native.read_profile_columns(fp, ["f1"])
    fp2 = tmp_path / "no_tract.csv"
    fp2.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError):
        profiles_native.read_profile_columns(fp2, ["a"])


def test_parse_float_bit_exact_vs_pandas(tmp_path):
    """The native float parse must be BIT-exact vs pandas' float64 parse +
    float32 cast (ADVICE r2): correctly rounded double via the Clinger fast
    path (exact u64 mantissa x exact power of ten) with a strtod fallback
    for long/extreme tokens."""
    import pandas as pd

    rng = np.random.default_rng(7)
    vals = rng.standard_normal(3000) * 10.0 ** rng.integers(-35, 35, 3000)
    strs = [repr(float(v)) for v in vals]
    strs += ["%.6g" % v for v in vals[:500]]          # short prints
    strs += ["%.17g" % v for v in vals[500:1000]]     # full double prints
    strs += [".5", "-.25", "5.", "+3.25", "1e999", "-1e999", "00012.5",
             "1.00000000000000000001", "9007199254740993", "1e-45",
             "3.4028235e38", "3.4028236e38", "1.1754944e-38", "2.5e-324",
             "123456789012345678901234567890", "0.1", "0.2", "0.3",
             "inf", "-inf", "nan", ""]
    fp = tmp_path / "exact.csv"
    with open(fp, "w") as f:
        f.write("tract_id,x\n")
        for s in strs:
            f.write(f"t,{s}\n")
    out = profiles_native.read_profile_columns(fp, ["x"])
    assert out is not None
    native = out[0][:, 0]
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # overflow on cast
        ref = pd.read_csv(fp, skip_blank_lines=False)["x"].to_numpy(
            np.float64).astype(np.float32)
    # pandas drops the blank-field row to NaN as well; align lengths
    assert len(native) == len(ref)
    eq = (native == ref) | (np.isnan(native) & np.isnan(ref))
    bad = np.where(~eq)[0]
    assert eq.all(), [(strs[i], native[i], ref[i]) for i in bad[:5]]

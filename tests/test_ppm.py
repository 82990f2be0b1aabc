import io

import numpy as np

from art_tpu.utils.ppm import format_ppm, read_ppm, write_ppm


def test_header_and_row_order():
    fb = np.zeros((2, 3, 3), np.float32)
    fb[0, 0] = [1.0, 0.0, 0.0]  # bottom-left red
    fb[1, 2] = [0.0, 0.0, 1.0]  # top-right blue
    text = format_ppm(fb)
    lines = text.strip().splitlines()
    assert lines[0] == "P3"
    assert lines[1] == "3 2"
    assert lines[2] == "255"
    # rows written top-down: first row is fb[1]
    first_row = lines[3:6]
    assert first_row[2] == "0 0 255"
    second_row = lines[6:9]
    assert second_row[0] == "255 0 0"


def test_truncation_matches_int_cast():
    # int(255.99 * c) truncation (src/main.cu:722-724)
    fb = np.full((1, 1, 3), 0.5, np.float32)
    text = format_ppm(fb)
    assert text.strip().splitlines()[-1] == "127 127 127"
    fb = np.ones((1, 1, 3), np.float32)
    assert format_ppm(fb).strip().splitlines()[-1] == "255 255 255"


def test_no_clamp_by_default():
    # emissive scenes can exceed 255 (deliberate reference quirk)
    fb = np.full((1, 1, 3), 2.0, np.float32)
    assert format_ppm(fb).strip().splitlines()[-1] == "511 511 511"
    assert format_ppm(fb, clamp=True).strip().splitlines()[-1] == "255 255 255"


def test_roundtrip():
    rng = np.random.default_rng(0)
    fb = rng.uniform(0, 1, size=(4, 5, 3)).astype(np.float32)
    text = format_ppm(fb)
    back = read_ppm(text)
    np.testing.assert_array_equal(back, np.trunc(fb * 255.99).astype(np.int64))


def test_write_ppm_stream():
    fb = np.zeros((1, 1, 3), np.float32)
    buf = io.StringIO()
    write_ppm(fb, buf)
    assert buf.getvalue().startswith("P3\n1 1\n255\n")


def test_nan_pixel_native_matches_python():
    """A NaN pixel truncates to INT64_MIN; the native writer must print it
    exactly like Python (-9223372036854775808) — negating INT64_MIN with
    signed arithmetic is UB — and the buffer must be sized off min()/max()
    separately (abs(INT64_MIN) is itself negative)."""
    from art_tpu.utils import ppm as ppm_mod

    fb = np.zeros((1, 2, 3), np.float32)
    fb[0, 1, 0] = np.nan
    text = format_ppm(fb)
    want_vals = ["0", "0", "0", "-9223372036854775808", "0", "0"]
    assert text.strip().splitlines()[3:] == [
        "0 0 0", "-9223372036854775808 0 0"
    ] or text.split()[4:] == want_vals
    # both writers, regardless of whether the native lib built:
    if ppm_mod._load_native() is not None:
        lib = ppm_mod._native_lib
        ppm_mod._native_lib = None
        try:
            assert format_ppm(fb) == text
        finally:
            ppm_mod._native_lib = lib

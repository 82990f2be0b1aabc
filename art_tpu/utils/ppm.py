"""PPM P3 output with the reference's exact contract.

The reference writes the image to **stdout** as ASCII PPM, rows top-down
(j = ny-1 .. 0), each channel as ``int(255.99 * c)`` with **no clamping**
(reference src/main.cu:715-727), so emissive scenes can produce out-of-range
P3 values.  ``write_ppm`` reproduces that bit-for-bit by default; clamping is
an explicit opt-in flag (a deliberate-quirk decision documented in
SURVEY.md §7).
"""

from __future__ import annotations

import io

import numpy as np


def format_ppm(fb: np.ndarray, clamp: bool = False) -> str:
    """Format a (ny, nx, 3) float framebuffer (row 0 = bottom scanline) as PPM P3.

    Row 0 of ``fb`` is the *bottom* of the image (the reference framebuffer
    is indexed pixel = j*nx + i with j growing upward); rows are emitted
    top-down exactly like the reference writer loop (src/main.cu:717-727).
    """
    fb = np.asarray(fb, np.float64)
    ny, nx, _ = fb.shape
    vals = fb * 255.99
    if clamp:
        vals = np.clip(vals, 0.0, 255.0)
    # int() in C++ truncates toward zero.
    ints = np.trunc(vals).astype(np.int64)
    out = io.StringIO()
    out.write(f"P3\n{nx} {ny}\n255\n")
    # top-down: j = ny-1 .. 0
    for j in range(ny - 1, -1, -1):
        row = ints[j]
        out.write("\n".join(f"{r} {g} {b}" for r, g, b in row))
        out.write("\n")
    return out.getvalue()


def write_ppm(fb: np.ndarray, stream, clamp: bool = False) -> None:
    stream.write(format_ppm(fb, clamp=clamp))


def read_ppm(text: str) -> np.ndarray:
    """Parse a P3 PPM back into a (ny, nx, 3) int array (row 0 = bottom).

    Used by the test suite to round-trip the output contract.
    """
    tokens = []
    for line in text.splitlines():
        line = line.split("#", 1)[0]
        tokens.extend(line.split())
    assert tokens[0] == "P3", "not a P3 PPM"
    nx, ny, _maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    data = np.array(tokens[4:], dtype=np.int64).reshape(ny, nx, 3)
    # File rows are top-down; flip back to bottom-up framebuffer order.
    return data[::-1]

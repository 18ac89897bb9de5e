"""Real spherical-harmonics direction encoding, degree 1..8.

Parity with reference shencoder/src/shencoder.cu:28-356, which hard-codes the
Cartesian polynomial expansion of the real SH basis (Condon-Shortley phase,
components ordered l = 0..deg-1, m = -l..l).

Instead of porting 330 lines of polynomials we evaluate the same basis with the
standard associated-Legendre recurrence (unrolled statically per degree, so XLA
sees pure elementwise arithmetic -- identical fusion behavior, and the backward
pass falls out of autodiff instead of a hand-written kernel):

  P̄_m^m   = (-1)^m (2m-1)!!                      (sin^m θ factored into C_m/S_m)
  P̄_{m+1}^m = (2m+1) z P̄_m^m
  P̄_l^m   = ((2l-1) z P̄_{l-1}^m - (l+m-1) P̄_{l-2}^m) / (l-m)
  C_m = x C_{m-1} - y S_{m-1},  S_m = x S_{m-1} + y C_{m-1}   (C_0=1, S_0=0)

  Y_{l,0}  = K_l^0 P̄_l^0
  Y_{l,±m} = √2 K_l^m P̄_l^m · (C_m for +m, S_m for -m)

with K_l^m = sqrt((2l+1)/(4π) (l-m)!/(l+m)!). Verified against the reference's
hard-coded constants for degree <= 5 in tests/test_sh_encode.py.
"""

import math

import jax.numpy as jnp


def sh_output_dim(degree: int) -> int:
    return degree * degree


def _K(l: int, m: int) -> float:
    return math.sqrt(
        (2 * l + 1) / (4.0 * math.pi) * math.factorial(l - m) / math.factorial(l + m)
    )


def _double_factorial(n: int) -> int:
    out = 1
    while n > 1:
        out *= n
        n -= 2
    return out


def sh_encode(d, degree: int = 4):
    """Encode unit directions with real spherical harmonics.

    Args:
      d: [..., 3] float, unit directions (components in [-1, 1]).
      degree: SH degree in [1, 8]; output has degree**2 channels.

    Returns:
      [..., degree**2] float array.
    """
    if not (1 <= degree <= 8):
        raise ValueError(f"SH degree must be in [1, 8], got {degree}")

    x, y, z = d[..., 0], d[..., 1], d[..., 2]

    # C_m, S_m (r_xy^m cos(m phi), r_xy^m sin(m phi)) built incrementally.
    C = [jnp.ones_like(x)]
    S = [jnp.zeros_like(x)]
    for m in range(1, degree):
        C.append(x * C[m - 1] - y * S[m - 1])
        S.append(x * S[m - 1] + y * C[m - 1])

    # P̄_l^m(z), sin^m(theta) factored out, Condon-Shortley phase included.
    P = {}
    for m in range(degree):
        P[(m, m)] = jnp.full_like(z, ((-1.0) ** m) * _double_factorial(2 * m - 1))
        if m + 1 < degree:
            P[(m + 1, m)] = (2 * m + 1) * z * P[(m, m)]
        for l in range(m + 2, degree):
            P[(l, m)] = (
                (2 * l - 1) * z * P[(l - 1, m)] - (l + m - 1) * P[(l - 2, m)]
            ) / (l - m)

    out = []
    sqrt2 = math.sqrt(2.0)
    for l in range(degree):
        for m in range(-l, l + 1):
            am = abs(m)
            if m == 0:
                out.append(_K(l, 0) * P[(l, 0)])
            elif m > 0:
                out.append(sqrt2 * _K(l, am) * P[(l, am)] * C[am])
            else:
                out.append(sqrt2 * _K(l, am) * P[(l, am)] * S[am])
    return jnp.stack(out, axis=-1)

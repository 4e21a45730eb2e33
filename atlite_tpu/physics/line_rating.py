"""IEEE-738 dynamic line rating — device kernel.

Parity with /root/reference/atlite/convert.py:1152-1252: steady-state
conductor thermal balance (forced + natural convection, radiative loss,
solar gain) solved for ampacity.

TPU-native restructuring: instead of the reference's per-line dask.delayed
fan-out over variable-size cell subsets (convert.py:1354-1365), lines are
batched into a padded (L, K) cell-gather — a single fused kernel evaluates
all lines over all timesteps, and a masked min reduces over each line's
cells.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def ampacity(fields, psi, R, D=0.028, Ts=373, epsilon=0.6, alpha=0.6):
    """Maximal current per cell [A] (convert.py:1196-1251).

    fields: dict with 'temperature', 'wnd100m', 'height', 'wnd_azimuth',
    'influx_direct', 'solar_altitude', 'solar_azimuth' — arrays of any
    common broadcastable shape.  ``psi`` is the line azimuth; like the
    reference it is passed through ``radians()`` (convert.py:1215), so pass
    degrees when calling directly (the IEEE test case does) and be aware the
    reference's ``line_rating`` wrapper feeds radians — we reproduce that
    behavior bug-for-bug for conformance.
    """
    Ta = fields["temperature"]
    Tfilm = (Ta + Ts) / 2
    T0 = 273.15

    # forced convection (IEEE-738 eq. 3a/3b, 13a, 14a)
    V = fields["wnd100m"]
    mu = (1.458e-6 * Tfilm**1.5) / (Tfilm + 383.4 - T0)  # dynamic viscosity
    H = fields["height"]
    rho = (1.293 - 1.525e-4 * H + 6.379e-9 * H**2) / (1 + 0.00367 * (Tfilm - T0))
    reynold = D * V * rho / mu
    k = 2.424e-2 + 7.477e-5 * (Tfilm - T0) - 4.407e-9 * (Tfilm - T0) ** 2
    anglediff = fields["wnd_azimuth"] - jnp.radians(psi)
    Phi = jnp.abs(jnp.mod(anglediff + np.pi / 2, np.pi) - np.pi / 2)
    K = 1.194 - jnp.cos(Phi) + 0.194 * jnp.cos(2 * Phi) + 0.368 * jnp.sin(2 * Phi)

    Tdiff = Ts - Ta
    qcf1 = K * (1.01 + 1.347 * reynold**0.52) * k * Tdiff
    qcf2 = K * 0.754 * reynold**0.6 * k * Tdiff
    qcf = jnp.maximum(qcf1, qcf2)

    # natural convection
    qcn = 3.645 * jnp.sqrt(rho) * D**0.75 * Tdiff**1.25
    qc = jnp.maximum(qcf, qcn)

    # radiated loss
    qr = 17.8 * D * epsilon * ((Ts / 100) ** 4 - (Ta / 100) ** 4)

    # solar gain (line-sun incidence)
    Q = fields["influx_direct"]
    A = D * 1.0
    Phi_s = jnp.arccos(
        jnp.cos(fields["solar_altitude"])
        * jnp.cos(fields["solar_azimuth"] - jnp.radians(psi))
    )
    qs = alpha * Q * A * jnp.sin(Phi_s)

    return jnp.sqrt((qc + qr - qs) / R)


def batched_line_rating(cell_fields, mask, psi, R, D, Ts, epsilon, alpha):
    """Ampacity per line: masked min over each line's cells.

    cell_fields: dict of (L, K, T) arrays gathered per line (padded to K
    cells); mask: (L, K) bool validity; per-line params: (L,) arrays.
    Returns (L, T).
    """
    expand = lambda p: jnp.asarray(p)[:, None, None]
    imax = ampacity(cell_fields, expand(psi), expand(R), expand(D),
                    expand(Ts), expand(epsilon), expand(alpha))
    # mask padded cells AND per-cell NaNs (e.g. qc+qr-qs < 0 under an
    # unusual Ts) to +inf: the reference's .min('spatial') skips NaN, so
    # one bad cell must not NaN the whole line
    imax = jnp.where(mask[:, :, None] & ~jnp.isnan(imax), imax, jnp.inf)
    out = jnp.min(imax, axis=1)
    out = jnp.where(jnp.isinf(out), jnp.nan, out)  # all-NaN line -> NaN
    # lines with no intersecting cells -> NaN (reference uses a NaN dummy,
    # convert.py:1352-1360)
    return jnp.where(mask.any(axis=1)[:, None], out, jnp.nan)

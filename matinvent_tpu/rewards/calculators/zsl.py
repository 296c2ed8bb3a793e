"""Simplified Zur-McGill ZSL lattice matching for substrate MCIA rewards.

Stand-in for pymatgen's SubstrateAnalyzer used by the reference MCIA task
(/root/reference/rewards/calculators/pymatgen/calc.py:115-160). Implements the
core coincident-site-lattice search on the (001) surface cells:

1. enumerate multiple pairs (i, j) with i*A_film ~ j*A_sub,
2. enumerate Hermite-normal-form supercell matrices of each determinant,
3. Lagrange-reduce each candidate 2D superlattice,
4. accept when length/angle strains are below tolerance,
5. return the minimal coincident area.
"""
from __future__ import annotations

import math
import numpy as np


def _hnf_matrices(det: int) -> list[np.ndarray]:
    """All 2x2 Hermite-normal-form integer matrices with given determinant."""
    out = []
    for m11 in range(1, det + 1):
        if det % m11:
            continue
        m22 = det // m11
        for m21 in range(m22):
            out.append(np.array([[m11, 0], [m21, m22]], dtype=np.int64))
    return out


def _reduce_2d(v: np.ndarray) -> np.ndarray:
    """Lagrange/Gauss reduction of a 2D lattice basis (rows, 3-vectors)."""
    a, b = v[0].astype(np.float64), v[1].astype(np.float64)
    for _ in range(64):
        if np.dot(a, a) > np.dot(b, b):
            a, b = b, a
        mu = round(np.dot(a, b) / np.dot(a, a))
        b2 = b - mu * a
        if np.allclose(b2, b):
            break
        b = b2
    return np.stack([a, b])


def _cell_params(v: np.ndarray) -> tuple[float, float, float]:
    la = np.linalg.norm(v[0])
    lb = np.linalg.norm(v[1])
    cosang = np.dot(v[0], v[1]) / (la * lb)
    return la, lb, math.acos(max(-1.0, min(1.0, cosang)))


def min_coincident_area(
    film_surf: np.ndarray,  # [2, 3] film surface basis
    sub_surf: np.ndarray,  # [2, 3] substrate surface basis
    max_area: float = 400.0,
    max_strain: float = 0.09,
    area_tol: float = 0.02,
    max_det: int = 12,
) -> float | None:
    """Smallest coincident interface area (A^2), or None if no match."""
    area_f = float(np.linalg.norm(np.cross(film_surf[0], film_surf[1])))
    area_s = float(np.linalg.norm(np.cross(sub_surf[0], sub_surf[1])))
    if area_f <= 0 or area_s <= 0:
        return None

    candidates: list[tuple[float, int, int]] = []
    for i in range(1, max_det + 1):
        if i * area_f > max_area:
            break
        for j in range(1, max_det + 1):
            rel = abs(i * area_f - j * area_s) / max(i * area_f, j * area_s)
            if rel < area_tol:
                candidates.append((i * area_f, i, j))
    candidates.sort()

    for area, i, j in candidates:
        film_cells = [_reduce_2d(m @ film_surf) for m in _hnf_matrices(i)]
        sub_cells = [_reduce_2d(m @ sub_surf) for m in _hnf_matrices(j)]
        for fc in film_cells:
            fa, fb, fang = _cell_params(fc)
            for sc in sub_cells:
                sa, sb, sang = _cell_params(sc)
                # match either orientation of the reduced basis
                for (x1, x2) in ((sa, sb), (sb, sa)):
                    strain_a = abs(fa - x1) / x1
                    strain_b = abs(fb - x2) / x2
                    strain_ang = abs(fang - sang) / max(sang, 1e-6)
                    if max(strain_a, strain_b, strain_ang) < max_strain:
                        return area
    return None

"""Niggli cell reduction (Krivy-Gruber algorithm).

Host-side counterpart of the reference's symmetry/primitive-cell utilities
(/root/reference/pipeline/utils/crystal.py:5-11 uses pymatgen's spacegroup
machinery). Full spacegroup analysis is out of scope; the Niggli reduced cell
provides the canonical lattice normalization used for structure comparison
and cell standardization.

Implementation: I. Krivy & B. Gruber, Acta Cryst. (1976) A32, 297, with the
epsilon treatment of Grosse-Kunstleve et al. (2004).
"""
from __future__ import annotations

import numpy as np

from matinvent_tpu.chem.structure import Structure


def niggli_reduce_matrix(lattice: np.ndarray, eps: float = 1e-5, max_iter: int = 100) -> np.ndarray:
    """Return the Niggli-reduced lattice (rows are cell vectors)."""
    a_vec, b_vec, c_vec = [np.array(v, dtype=float) for v in lattice]

    def params():
        A = a_vec @ a_vec
        B = b_vec @ b_vec
        C = c_vec @ c_vec
        xi = 2 * (b_vec @ c_vec)
        eta = 2 * (a_vec @ c_vec)
        zeta = 2 * (a_vec @ b_vec)
        return A, B, C, xi, eta, zeta

    for _ in range(max_iter):
        A, B, C, xi, eta, zeta = params()
        # step 1
        if A > B + eps or (abs(A - B) < eps and abs(xi) > abs(eta) + eps):
            a_vec, b_vec = b_vec.copy(), a_vec.copy()
            a_vec, b_vec = -a_vec, -b_vec
            continue
        A, B, C, xi, eta, zeta = params()
        # step 2
        if B > C + eps or (abs(B - C) < eps and abs(eta) > abs(zeta) + eps):
            b_vec, c_vec = c_vec.copy(), b_vec.copy()
            b_vec, c_vec = -b_vec, -c_vec
            continue
        A, B, C, xi, eta, zeta = params()
        # steps 3/4 (Krivy-Gruber): make the angle cosines all positive when
        # xi*eta*zeta > 0, all non-positive otherwise. The diag(s1,s2,s3)
        # flips below have det +1 (each si is a parity of the other two
        # components' signs).
        strict_neg = sum(1 for v in (xi, eta, zeta) if v < -eps)
        strict_pos = sum(1 for v in (xi, eta, zeta) if v > eps)
        product_positive = strict_pos + strict_neg == 3 and strict_neg % 2 == 0
        if product_positive:
            s1 = 1 if (eta > -eps) == (zeta > -eps) else -1
            s2 = 1 if (xi > -eps) == (zeta > -eps) else -1
            s3 = 1 if (xi > -eps) == (eta > -eps) else -1
        else:
            s1 = 1 if (eta < eps) == (zeta < eps) else -1
            s2 = 1 if (xi < eps) == (zeta < eps) else -1
            s3 = 1 if (xi < eps) == (eta < eps) else -1
        a_vec, b_vec, c_vec = s1 * a_vec, s2 * b_vec, s3 * c_vec

        A, B, C, xi, eta, zeta = params()
        # step 5
        if abs(xi) > B + eps or (abs(B - xi) < eps and 2 * eta < zeta - eps) or (
            abs(B + xi) < eps and zeta < -eps
        ):
            c_vec = c_vec - np.sign(xi) * b_vec
            continue
        # step 6
        if abs(eta) > A + eps or (abs(A - eta) < eps and 2 * xi < zeta - eps) or (
            abs(A + eta) < eps and zeta < -eps
        ):
            c_vec = c_vec - np.sign(eta) * a_vec
            continue
        # step 7
        if abs(zeta) > A + eps or (abs(A - zeta) < eps and 2 * xi < eta - eps) or (
            abs(A + zeta) < eps and eta < -eps
        ):
            b_vec = b_vec - np.sign(zeta) * a_vec
            continue
        # step 8
        if xi + eta + zeta + A + B < -eps or (
            abs(xi + eta + zeta + A + B) < eps and 2 * (A + eta) + zeta > eps
        ):
            c_vec = c_vec + a_vec + b_vec
            continue
        break

    return np.stack([a_vec, b_vec, c_vec])


def niggli_reduce(structure: Structure, eps: float = 1e-5) -> Structure:
    """Structure with the Niggli-reduced cell (same crystal, remapped coords)."""
    new_lat = niggli_reduce_matrix(structure.lattice, eps=eps)
    cart = structure.cart_coords
    frac = cart @ np.linalg.pinv(new_lat)
    return Structure(new_lat, structure.species, frac % 1.0)

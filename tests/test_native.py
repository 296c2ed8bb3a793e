"""Native C++ charge-balance module: build, correctness, Python parity."""
import itertools
import random

import pytest

from matinvent_tpu.chem.composition import Composition
from matinvent_tpu.chem.data import ELECTRONEGATIVITY, OXIDATION_STATES
from matinvent_tpu.chem import validity
from matinvent_tpu.native import charge_balanced_native


def python_reference(symbols, counts):
    """Brute-force product enumeration (the pre-native semantics)."""
    ox_lists = [OXIDATION_STATES.get(s, []) for s in symbols]
    if any(not o for o in ox_lists):
        return False
    for combo in itertools.product(*ox_lists):
        if sum(o * c for o, c in zip(combo, counts)) != 0:
            continue
        if validity._pauling_ok(list(symbols), combo):
            return True
    return False


@pytest.fixture(scope="module")
def native_available():
    out = charge_balanced_native([[1], [-1]], [1, 1], [1.0, 2.0])
    if out is None:
        pytest.skip("no C++ toolchain available")
    return True


class TestNativeChargeBalance:
    def test_simple_cases(self, native_available):
        assert charge_balanced_native([[1], [-1]], [1, 1], [0.9, 3.2]) is True
        # 2 Na+ cannot balance 3 Cl-
        assert charge_balanced_native([[1], [-1]], [2, 3], [0.9, 3.2]) is False
        # Pauling violation: 'cation' more electronegative than 'anion'
        assert charge_balanced_native([[1], [-1]], [1, 1], [3.5, 0.9]) is False

    def test_random_parity_with_python(self, native_available):
        rng = random.Random(0)
        symbols_pool = [s for s, v in OXIDATION_STATES.items() if v]
        mismatches = []
        for _ in range(300):
            k = rng.randint(2, 4)
            symbols = tuple(sorted(rng.sample(symbols_pool, k)))
            counts = tuple(rng.randint(1, 6) for _ in range(k))
            ox_lists = [OXIDATION_STATES[s] for s in symbols]
            ens = [ELECTRONEGATIVITY.get(s) for s in symbols]
            nat = charge_balanced_native(ox_lists, list(counts), ens)
            ref = python_reference(symbols, counts)
            if nat != ref:
                mismatches.append((symbols, counts, nat, ref))
        assert not mismatches, mismatches[:5]

    def test_smact_valid_uses_native(self, native_available):
        # end-to-end through the public API
        assert validity.smact_valid(Composition("NaCl"))
        assert not validity.smact_valid(Composition("Na2Cl3"))

    def test_many_element_composition_fast(self, native_available):
        import time

        # 6 multi-valent elements: the python product would be ~200k combos
        comp = Composition({"Mn": 3, "Mo": 2, "W": 1, "S": 4, "O": 2, "Cl": 1})
        t0 = time.perf_counter()
        validity.smact_valid(comp)
        assert time.perf_counter() - t0 < 1.0

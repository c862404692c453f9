"""Core layer tests: dtype registry, bit utils, registries, option parsing."""

import numpy as np
import pytest

from cl_ops_tpu.core import dtypes
from cl_ops_tpu.core.errors import CloOpsError
from cl_ops_tpu.core.registry import Registry, parse_options
from cl_ops_tpu.utils import bits


class TestDtypes:
    # The 11 reference types and their sizes (clo_common.c:54-68).
    REF_SIZES = {
        "char": 1, "uchar": 1, "short": 2, "ushort": 2, "int": 4, "uint": 4,
        "long": 8, "ulong": 8, "half": 2, "float": 4, "double": 8,
    }

    def test_all_names_present(self):
        assert set(dtypes.all_type_names()) == set(self.REF_SIZES)

    @pytest.mark.parametrize("name,size", sorted(REF_SIZES.items()))
    def test_sizeof(self, name, size):
        assert dtypes.type_sizeof(name) == size

    def test_roundtrip_name_dtype(self):
        for name in dtypes.all_type_names():
            info = dtypes.type_by_name(name)
            assert dtypes.type_name(info.dtype) == name

    def test_unknown_name(self):
        with pytest.raises(KeyError):
            dtypes.type_by_name("quux")

    def test_sum_widening(self):
        # uint -> ulong like clo_scan_bench defaults (clo_scan_bench.c:26-31).
        assert dtypes.default_sum_dtype("uint") == np.dtype(np.uint64)
        assert dtypes.default_sum_dtype("char") == np.dtype(np.int16)
        assert dtypes.default_sum_dtype("ulong") == np.dtype(np.uint64)
        assert dtypes.default_sum_dtype("half") == np.dtype(np.float32)
        assert dtypes.default_sum_dtype("double") == np.dtype(np.float64)

    def test_unsigned_equivalent(self):
        assert dtypes.unsigned_equivalent("int") == np.dtype(np.uint32)
        assert dtypes.unsigned_equivalent("double") == np.dtype(np.uint64)


class TestBits:
    def test_nlpo2(self):
        # Parity cases incl. the reference's nlpo2(0)==1 behavior.
        for x, want in [(0, 1), (1, 1), (2, 2), (3, 4), (4, 4), (5, 8),
                        (1023, 1024), (1024, 1024), (1025, 2048)]:
            assert bits.nlpo2(x) == want, x

    def test_ones32(self):
        assert bits.ones32(0) == 0
        assert bits.ones32(0xFFFFFFFF) == 32
        assert bits.ones32(0b1011) == 3

    def test_tzc(self):
        assert bits.tzc(0) == 32  # reference behavior for 0
        assert bits.tzc(1) == 0
        assert bits.tzc(8) == 3
        assert bits.tzc(0x80000000) == 31

    def test_sum(self):
        assert bits.sum_1_to_n(0) == 0
        assert bits.sum_1_to_n(4) == 10

    def test_worksize(self):
        assert bits.cdiv(10, 4) == 3
        assert bits.round_up(10, 4) == 12
        assert bits.is_po2(1) and bits.is_po2(64)
        assert not bits.is_po2(0) and not bits.is_po2(48)
        assert bits.log2_floor(1) == 0 and bits.log2_floor(1023) == 9


class TestRegistry:
    def test_register_get(self):
        reg = Registry("widget")

        @reg.register("a")
        def make_a():
            return "A"

        assert reg.get("a")() == "A"
        assert "a" in reg and reg.names() == ["a"]

    def test_duplicate_rejected(self):
        reg = Registry("widget")
        reg.register("x")(lambda: 1)
        with pytest.raises(CloOpsError):
            reg.register("x")(lambda: 2)

    def test_unknown(self):
        reg = Registry("widget")
        with pytest.raises(CloOpsError):
            reg.get("nope")

    def test_parse_options(self):
        # satradix-style option strings (clo_sort_satradix.c:353-421).
        assert parse_options("radix=16,scan=blelloch") == {
            "radix": "16", "scan": "blelloch"}
        assert parse_options("") == {}
        assert parse_options(None) == {}
        assert parse_options("flag") == {"flag": "1"}
        assert parse_options({"radix": 16}) == {"radix": "16"}


class TestVerifyDeferred:
    """verify_deferred: the serving-form exactness witness (defer.py)."""

    def test_clean_witnesses_pass(self):
        import numpy as np
        from cl_ops_tpu import verify_deferred
        verify_deferred(np.zeros(4, np.int32))
        verify_deferred(np.zeros((), np.bool_), op_name="rollup")
        # nested tuples, as returned by dist_hash_join(check="defer")
        verify_deferred((np.zeros(8, np.int32), np.zeros(8, np.int32)))

    def test_dropped_counter_fires(self):
        import numpy as np
        import pytest
        from cl_ops_tpu import DeferredOverflowError, verify_deferred
        d = np.zeros(8, np.int32)
        d[3] = 17
        with pytest.raises(DeferredOverflowError, match="17 dropped"):
            verify_deferred((np.zeros(8, np.int32), d),
                            op_name="dist_hash_join")

    def test_overflow_flag_fires(self):
        import numpy as np
        import pytest
        from cl_ops_tpu import DeferredOverflowError, verify_deferred
        with pytest.raises(DeferredOverflowError, match="overflow flag"):
            verify_deferred(np.asarray(True), op_name="rollup_query")

    def test_device_arrays(self):
        import jax.numpy as jnp
        import pytest
        from cl_ops_tpu import DeferredOverflowError, verify_deferred
        verify_deferred(jnp.zeros(4, jnp.int32), jnp.zeros((), jnp.bool_))
        with pytest.raises(DeferredOverflowError):
            verify_deferred(jnp.ones(2, jnp.int32))

    def test_no_witnesses_rejected(self):
        import pytest
        from cl_ops_tpu import verify_deferred
        with pytest.raises(ValueError):
            verify_deferred()

"""SmallFloat norm encoding properties (SURVEY.md §4.4.1, FIXTURES.md §4).

Pattern follows the reference's randomized round-trip tests
(`[U] lucene/core/src/test/org/apache/lucene/util/TestSmallFloat.java`).
"""

import numpy as np
from hypothesis import given, strategies as st

from lucene_solr_spark.functions.smallfloat import (
    LENGTH_TABLE,
    byte4_to_int,
    encode_norms,
    int_to_byte4,
)


def test_small_values_exact():
    for i in range(16):
        assert byte4_to_int(int_to_byte4(i)) == i


def test_known_values():
    # hand-computed: 16 -> mantissa 0b1000, shift 1 -> byte 16 -> 16
    assert int_to_byte4(16) == 16
    assert byte4_to_int(16) == 16
    # 17 floors to 16 (4-bit mantissa)
    assert int_to_byte4(17) == 16
    # 18 is representable: bits=0b1001 -> byte 17
    assert int_to_byte4(18) == 17
    assert byte4_to_int(17) == 18


@given(st.integers(min_value=0, max_value=2**24))
def test_roundtrip_floor(i):
    b = int_to_byte4(i)
    dec = byte4_to_int(b)
    assert dec <= i
    # dec is the LARGEST representable value <= i
    if b < 255:
        assert byte4_to_int(b + 1) > i
    # idempotence
    assert int_to_byte4(dec) == b


@given(st.lists(st.integers(min_value=0, max_value=2**24), max_size=200))
def test_monotonic_and_vectorized(vals):
    enc = [int_to_byte4(v) for v in vals]
    # vectorized encoder agrees with scalar
    assert list(encode_norms(np.array(vals, dtype=np.int64))) == enc
    for a, b in zip(sorted(vals), sorted(vals)[1:]):
        assert int_to_byte4(a) <= int_to_byte4(b)


def test_length_table_increasing():
    assert len(LENGTH_TABLE) == 256
    assert np.all(np.diff(LENGTH_TABLE) > 0)


def test_classic_norm_table_properties():
    import numpy as np
    from hypothesis import given, strategies as st

    from lucene_solr_spark.functions.smallfloat import (LENGTH_TABLE,
                                                        int_to_byte4)
    from lucene_solr_spark.functions.tfidf import (classic_norm_table,
                                                   classic_score_tf)

    tbl = classic_norm_table()
    assert tbl[0] == 0.0
    # longer decoded length -> smaller-or-equal norm (1/sqrt monotone)
    assert all(tbl[i] >= tbl[i + 1] for i in range(1, 255))

    @given(st.integers(min_value=1, max_value=1 << 30),
           st.integers(min_value=1, max_value=1000))
    def check(dl, tf):
        b = int_to_byte4(dl)
        exact = np.float32(
            np.float32(np.sqrt(float(tf))) * np.float32(2.0)
        ) * np.float32(1.0 / np.sqrt(float(LENGTH_TABLE[b])))
        got = classic_score_tf(np.float32(2.0), np.array([tf]),
                               np.array([b]), tbl)[0]
        assert got == np.float32(exact)

    check()

"""Golden corpus: every compressed artifact's SHA256 is frozen.

See :mod:`golden_corpus` for the case inventory.  A failure here means a
code change altered output BITS — which breaks compatibility with every
previously written ``.hff``/``.hf2`` file and with the reference binary's
tie-shape behavior (`branch_heap.rs:64-83`).  Never "fix" the manifest to
make a failure pass unless the format change is deliberate and documented.
"""

import hashlib
import json
import os

import numpy as np
import pytest

from golden_corpus import MANIFEST, build_entry, cases

with open(MANIFEST) as fp:
    _MANIFEST = json.load(fp)

_CASES = cases()


def test_manifest_covers_all_cases():
    assert set(_MANIFEST) == set(_CASES)
    pads = {e["data_padding"] for e in _MANIFEST.values()}
    assert pads == set(range(8))


@pytest.mark.parametrize("name", sorted(_CASES))
def test_golden_bits(name, tmp_path):
    data = _CASES[name]
    want = _MANIFEST[name]
    # the generator itself must be deterministic across numpy versions
    assert hashlib.sha256(data.tobytes()).hexdigest() == want["input_sha256"]
    got = build_entry(name, data, str(tmp_path))
    # reindex_sha256 is produced only when the native runtime built; every
    # key that WAS produced must match the frozen value
    assert set(want) - set(got) <= {"reindex_sha256"}
    for key, val in got.items():
        assert want[key] == val, f"compressed bits changed for {name!r}:{key}"


@pytest.mark.parametrize("name", ["fib24_deep", "text_10k", "ties256_x17",
                                  "pad_sweep_2", "single_byte"])
def test_golden_roundtrip(name, tmp_path):
    from tpuhuff.io import read_compress_write, read_decompress_write

    data = _CASES[name]
    src = tmp_path / "in.bin"
    data.tofile(src)
    read_compress_write(str(src), str(tmp_path / "c.hff"))
    read_decompress_write(str(tmp_path / "c.hff"), str(tmp_path / "out.bin"))
    assert (tmp_path / "out.bin").read_bytes() == data.tobytes()


def test_numpy_and_native_encoders_agree(tmp_path):
    """The frozen hashes must not depend on whether the C++ runtime built."""
    from tpuhuff import native
    from tpuhuff.core.codec import pack_codes_u8
    from tpuhuff.core.tree import HuffTree
    from tpuhuff.core.weights import ByteWeights

    if not native.available():
        pytest.skip("native runtime unavailable")
    for name in ("text_10k", "fib24_deep", "ties100_x5", "pad_sweep_5"):
        data = _CASES[name]
        tree = HuffTree.from_weights(ByteWeights.from_bytes(data))
        lens, codes = tree.encode_tables()
        assert native.encode(data, lens, codes) == pack_codes_u8(
            data, lens, codes
        ), name


class TestReferenceHffFixtures:
    """Binary-origin .hff fixtures pinned from the reference's own docs
    (tests/golden/README.md documents each byte's provenance)."""

    GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden")
    CASES = ("ref_abbccc", "ref_ffaacc", "ref_zzzzz")

    def _paths(self, name):
        return (os.path.join(self.GOLDEN, name + ".hff"),
                os.path.join(self.GOLDEN, name + ".bin"))

    def test_decode_reference_fixtures(self, tmp_path):
        from tpuhuff.io.stream import read_decompress_write

        for name in self.CASES:
            hff, bin_ = self._paths(name)
            out = tmp_path / (name + ".out")
            read_decompress_write(hff, str(out))
            assert out.read_bytes() == open(bin_, "rb").read(), name

    def test_encode_matches_reference_fixtures(self, tmp_path):
        # the u8/ByteWeights path is deterministic (ascending-byte heap
        # seed + tie-faithful sift), so our .hff must be byte-identical
        from tpuhuff.io.stream import read_compress_write

        for name in self.CASES:
            hff, bin_ = self._paths(name)
            out = tmp_path / (name + ".hff")
            read_compress_write(bin_, str(out))
            assert out.read_bytes() == open(hff, "rb").read(), name

    def test_library_container_matches(self):
        import tpuhuff

        for name in self.CASES:
            hff, bin_ = self._paths(name)
            data = open(bin_, "rb").read()
            assert tpuhuff.compress(data).to_bytes() == \
                open(hff, "rb").read(), name
            cd = tpuhuff.CompressData.try_from_bytes(open(hff, "rb").read())
            assert tpuhuff.decompress(cd) == data, name

"""Device counting-Bloom-filter parity (SURVEY §2.11 P8; reference:
bloom/KCountArray7MTA.java atomic packed cells)."""

import numpy as np
import pytest

from bbmap_tpu.index import kcount


@pytest.mark.parametrize("hashes", [1, 3])
def test_device_kca_parity(hashes):
    rng = np.random.default_rng(hashes)
    kmers = rng.integers(0, 2 ** 62, size=4000, dtype=np.int64)
    host = kcount.KCountArray(1 << 16, cell_bits=16, hashes=hashes)
    dev = kcount.DeviceKCountArray(1 << 16, cell_bits=16,
                                   hashes=hashes)
    for lo in range(0, 4000, 1000):     # multiple increment batches
        host.increment(kmers[lo:lo + 1000])
        dev.increment(kmers[lo:lo + 1000])
    q = rng.integers(0, 2 ** 62, size=3000, dtype=np.int64)
    q[:1500] = kmers[:1500]
    np.testing.assert_array_equal(dev.read(q), host.read(q))
    assert abs(dev.used_fraction() - host.used_fraction()) < 1e-9


def test_device_kca_duplicate_accumulation():
    dev = kcount.DeviceKCountArray(1 << 12, cell_bits=8, hashes=2)
    k = np.full(500, 12345, np.int64)
    dev.increment(k)
    got = dev.read(np.array([12345], np.int64))
    assert got[0] == 255          # saturated read at cell_max


def test_bbnorm_identical_with_device_kca(tmp_path, monkeypatch):
    from bbmap_tpu.tools import bbnorm

    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    g = bytes(rng.choice(bases, 5000))
    with open(tmp_path / "r.fq", "w") as f:
        for i in range(400):
            at = int(rng.integers(0, len(g) - 100))
            # half the reads from a 300bp hot region (high depth)
            if i % 2 == 0:
                at = int(rng.integers(1000, 1200))
            f.write(f"@r{i}\n{g[at:at+100].decode()}\n+\n{'I'*100}\n")
    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("BBMAP_DEVICE_KCA", mode)
        out = tmp_path / f"n{mode}.fq"
        rc = bbnorm.main([f"in={tmp_path/'r.fq'}", f"out={out}",
                          "target=5", "k=25", "passes=1"])
        assert rc == 0
        outs[mode] = out.read_text()
    assert outs["0"] == outs["1"]

"""The bench's on-hardware Pallas parity selftest must itself work (in
interpret mode here; bench runs it compiled on the TPU)."""

from bbmap_tpu.ops.msa_selftest import pallas_selftest


def test_selftest_passes_short():
    assert pallas_selftest(profiles=("short",), n=16)


def test_selftest_passes_pacbio():
    assert pallas_selftest(profiles=("pacbio",), n=16)


def test_selftest_catches_regression(monkeypatch):
    """A broken kernel must be detected, not silently accepted."""
    import bbmap_tpu.ops.msa_pallas as mp
    orig = mp.msa_score_pallas_t

    def broken(r1, r0, rp, rw, R, C, BB=512, P=None):
        out = orig(r1, r0, rp, rw, R, C, BB, P)
        return out.at[0].add(1)

    monkeypatch.setattr(mp, "msa_score_pallas_t", broken)
    msgs = []
    assert not pallas_selftest(profiles=("short",), n=16,
                               verbose=msgs.append)
    assert any("MISMATCH" in m for m in msgs)

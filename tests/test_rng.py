"""RNG parity tests.

TorchCPURNG must be bit-identical to torch CPU randn (comfyui noise).
MT19937RNG is the torch-free fallback — same MT19937 stream/uniforms, gaussian
transform within 1 ulp of torch's Sleef-vectorized path.
PhiloxRNG follows the webui rng_philox stream; we verify the on-device JAX
implementation is bit-identical to the numpy one and check stream semantics.
"""
import numpy as np
import pytest

from sdtpu.rng import MT19937RNG, NumpyRNG, PhiloxRNG, TorchCPURNG, create_rng, philox_randn_jax


@pytest.mark.parametrize("seed", [0, 42, 1234567, 2**63 + 5])
@pytest.mark.parametrize("n", [7, 16, 64, 1000, 4096])
def test_torch_cpu_rng_exact(seed, n):
    torch = pytest.importorskip("torch")
    g = torch.Generator(device="cpu")
    g.manual_seed(seed & 0xFFFFFFFFFFFFFFFF)
    want = torch.randn(n, generator=g).numpy()
    got = TorchCPURNG(seed).randn(n)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [0, 42, 1234567])
@pytest.mark.parametrize("n", [16, 64, 1000, 4096])
def test_mt19937_fallback_near_torch(seed, n):
    """numpy fallback: identical MT19937 uniforms, gaussians within 1 ulp."""
    torch = pytest.importorskip("torch")
    g = torch.Generator(device="cpu")
    g.manual_seed(seed)
    want = torch.randn(n, generator=g).numpy()
    got = MT19937RNG(seed).randn(n)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_mt19937_sequential_draws():
    torch = pytest.importorskip("torch")
    g = torch.Generator(device="cpu")
    g.manual_seed(3)
    want = np.concatenate([torch.randn(100, generator=g).numpy() for _ in range(3)])
    rng = TorchCPURNG(3)
    got = np.concatenate([rng.randn(100) for _ in range(3)])
    np.testing.assert_array_equal(got, want)
    rng2 = MT19937RNG(3)
    got2 = np.concatenate([rng2.randn(100) for _ in range(3)])
    np.testing.assert_allclose(got2, want, rtol=0, atol=2e-6)


def test_philox_known_statistics():
    rng = PhiloxRNG(42)
    x = rng.randn(100_000)
    assert abs(float(x.mean())) < 0.02
    assert abs(float(x.std()) - 1.0) < 0.02


def test_philox_offset_semantics():
    rng = PhiloxRNG(42)
    a = rng.randn(16)
    b = rng.randn(16)
    assert not np.array_equal(a, b)
    rng2 = PhiloxRNG(42)
    np.testing.assert_array_equal(rng2.randn(16), a)
    np.testing.assert_array_equal(rng2.randn(16), b)


def test_philox_prefix_property():
    # counter layout means first n values of a larger draw equal a smaller draw
    a = PhiloxRNG(7).randn(32)
    b = PhiloxRNG(7).randn(1024)
    np.testing.assert_array_equal(a, b[:32])


def test_philox_jax_bits_exact():
    """Integer Philox words must be bit-identical to the numpy stream."""
    import jax

    from sdtpu.rng import _philox4_32, philox_bits_jax, philox_split_seed

    bits = jax.jit(philox_bits_jax, static_argnums=2)
    for seed in [0, 42, 2**40 + 3]:
        key = philox_split_seed(seed)
        for offset in range(3):
            n = 2048
            counter = np.zeros((4, n), dtype=np.uint32)
            counter[0, :] = offset
            counter[2, :] = np.arange(n, dtype=np.uint32)
            k = np.empty((2, n), dtype=np.uint32)
            k[0, :], k[1, :] = key
            want = _philox4_32(counter, k)
            g0, g1 = bits(key, offset, n)
            np.testing.assert_array_equal(np.asarray(g0), want[0])
            np.testing.assert_array_equal(np.asarray(g1), want[1])


def test_philox_jax_randn_close():
    """Gaussians match within libm rounding (log/sin differ by ulps per backend)."""
    import jax

    from sdtpu.rng import philox_split_seed

    fn = jax.jit(philox_randn_jax, static_argnums=2)
    for seed in [0, 42]:
        host = PhiloxRNG(seed)
        key = philox_split_seed(seed)
        want = host.randn(2048)
        got = np.asarray(fn(key, 0, 2048))
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_create_rng():
    assert isinstance(create_rng("cuda"), PhiloxRNG)
    assert isinstance(create_rng("cpu"), (TorchCPURNG, MT19937RNG))
    assert isinstance(create_rng("std_default"), NumpyRNG)
    with pytest.raises(ValueError):
        create_rng("bogus")

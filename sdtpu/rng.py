"""Seed-reproducible RNGs matching webui (CUDA) and comfyui (CPU torch) noise.

Reference behavior: src/core/rng.hpp:7, src/core/rng_philox.hpp:11 (webui
Philox4x32-10, "--rng cuda"), src/core/rng_mt19937.hpp:15 (torch-CPU MT19937,
"--rng cpu").  Noise parity is what makes outputs reproducible across
implementations (reference README.md:111-113).

TPU-first design: Philox is counter-based, so ``philox_randn_jax`` generates the
identical stream *on device* inside a jitted program — no host round-trip.  The
numpy versions exist for tests and for host-side latent prep.
"""
from __future__ import annotations

import numpy as np

PHILOX_M0 = np.uint64(0xD2511F53)
PHILOX_M1 = np.uint64(0xCD9E8D57)
PHILOX_W0 = np.uint32(0x9E3779B9)
PHILOX_W1 = np.uint32(0xBB67AE85)
TWO_POW32_INV = np.float32(2.3283064e-10)
TWO_POW32_INV_2PI = np.float32(2.3283064e-10 * 6.2831855)


def _philox4_32(counter: np.ndarray, key: np.ndarray, rounds: int = 10) -> np.ndarray:
    """Philox4x32 block cipher. counter: (4, N) uint32, key: (2, N) uint32."""
    counter = counter.copy()
    key = key.copy()
    for r in range(rounds):
        v1 = counter[0].astype(np.uint64) * PHILOX_M0
        v2 = counter[2].astype(np.uint64) * PHILOX_M1
        hi1 = (v1 >> np.uint64(32)).astype(np.uint32)
        lo1 = v1.astype(np.uint32)
        hi2 = (v2 >> np.uint64(32)).astype(np.uint32)
        lo2 = v2.astype(np.uint32)
        new0 = hi2 ^ counter[1] ^ key[0]
        new2 = hi1 ^ counter[3] ^ key[1]
        counter = np.stack([new0, lo2, new2, lo1])
        if r != rounds - 1:
            key = np.stack([key[0] + PHILOX_W0, key[1] + PHILOX_W1])
    return counter


class PhiloxRNG:
    """webui-compatible gaussian stream (reference src/core/rng_philox.hpp:11)."""

    def __init__(self, seed: int = 0):
        self.manual_seed(seed)

    def manual_seed(self, seed: int) -> None:
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.offset = 0

    def randn(self, n: int) -> np.ndarray:
        counter = np.zeros((4, n), dtype=np.uint32)
        counter[0, :] = self.offset
        counter[2, :] = np.arange(n, dtype=np.uint32)
        self.offset += 1
        key = np.empty((2, n), dtype=np.uint32)
        key[0, :] = self.seed & 0xFFFFFFFF
        key[1, :] = (self.seed >> 32) & 0xFFFFFFFF
        g = _philox4_32(counter, key)
        return _box_muller_sin(g[0], g[1])

    def randn_shape(self, shape) -> np.ndarray:
        n = int(np.prod(shape))
        return self.randn(n).reshape(shape)


def _box_muller_sin(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    # webui keeps only the sin branch (one gaussian per 4x32 block).
    u = x.astype(np.float32) * TWO_POW32_INV + TWO_POW32_INV / np.float32(2)
    v = y.astype(np.float32) * TWO_POW32_INV_2PI + TWO_POW32_INV_2PI / np.float32(2)
    s = np.sqrt(np.float32(-2.0) * np.log(u))
    return (s * np.sin(v)).astype(np.float32)


def philox_split_seed(seed: int):
    """Host-side split of a 64-bit seed into the two 32-bit Philox key words."""
    seed = int(seed) & 0xFFFFFFFFFFFFFFFF
    return np.uint32(seed & 0xFFFFFFFF), np.uint32(seed >> 32)


def _umul32_wide(a, b_const: int):
    """(hi, lo) words of uint32 × uint32 using only 32-bit ops.

    JAX defaults to x64-disabled where uint64 silently truncates, so the
    64-bit products in the Philox round are built from 16-bit partials.
    """
    import jax.numpy as jnp

    mask = jnp.uint32(0xFFFF)
    a_lo = a & mask
    a_hi = a >> jnp.uint32(16)
    b_lo = jnp.uint32(b_const & 0xFFFF)
    b_hi = jnp.uint32(b_const >> 16)
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    lo = ll + ((lh + hl) << jnp.uint32(16))  # wraps mod 2^32 like the true low word
    carry = ((ll >> jnp.uint32(16)) + (lh & mask) + (hl & mask)) >> jnp.uint32(16)
    hi = hh + (lh >> jnp.uint32(16)) + (hl >> jnp.uint32(16)) + carry
    return hi, lo


def philox_bits_jax(seed, offset, n):
    """Raw Philox4x32-10 words (g0, g1) as uint32[n] — bit-identical to the
    numpy stream on every backend (pure integer math)."""
    import jax.numpy as jnp

    if isinstance(seed, tuple):
        s0, s1 = seed
    else:
        s0, s1 = philox_split_seed(seed)
    c0 = jnp.full((n,), jnp.asarray(offset).astype(jnp.uint32))
    c1 = jnp.zeros((n,), dtype=jnp.uint32)
    c2 = jnp.arange(n, dtype=jnp.uint32)
    c3 = jnp.zeros((n,), dtype=jnp.uint32)
    k0 = jnp.full((n,), jnp.asarray(s0).astype(jnp.uint32))
    k1 = jnp.full((n,), jnp.asarray(s1).astype(jnp.uint32))

    for r in range(10):
        hi1, lo1 = _umul32_wide(c0, 0xD2511F53)
        hi2, lo2 = _umul32_wide(c2, 0xCD9E8D57)
        c0, c1, c2, c3 = hi2 ^ c1 ^ k0, lo2, hi1 ^ c3 ^ k1, lo1
        if r != 9:
            k0 = k0 + jnp.uint32(0x9E3779B9)
            k1 = k1 + jnp.uint32(0xBB67AE85)
    return c0, c1


def philox_randn_jax(seed, offset, n):
    """On-device Philox gaussian stream following PhiloxRNG.randn.

    seed: python int or (k0, k1) uint32 pair from philox_split_seed.
    offset: int scalar (the draw index — PhiloxRNG increments once per randn
    call; may be a traced scan counter). n: static int. Returns float32[n].
    Uses only 32-bit integer ops, so it is correct with JAX x64 disabled.

    The integer stream is bit-identical to the webui/reference stream; the
    Box-Muller floats match within libm ulps (backend log/sin rounding).  For
    bit-exact latents use host PhiloxRNG noise fed in as an input array.
    """
    import jax.numpy as jnp

    g0, g1 = philox_bits_jax(seed, offset, n)
    u = g0.astype(jnp.float32) * TWO_POW32_INV + TWO_POW32_INV / np.float32(2)
    v = g1.astype(jnp.float32) * TWO_POW32_INV_2PI + TWO_POW32_INV_2PI / np.float32(2)
    s = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u))
    return s * jnp.sin(v)


class MT19937RNG:
    """comfyui/torch-CPU-compatible gaussian stream (src/core/rng_mt19937.hpp:15).

    Reproduces torch CPU's normal_fill path: fill the buffer with uniforms from
    MT19937, then Box-Muller in strided blocks of 16, recomputing a trailing
    window when size % 16 != 0; sizes < 16 use the cached double-precision
    polar path.

    torch seeds MT19937 with left_=1, so the first draw always twists — the
    stream is therefore a pure sequence of fully-consumed 624-word state
    blocks, which lets us vectorize generation block-wise.
    """

    _N, _M = 624, 397
    _MATRIX_A = np.uint32(0x9908B0DF)
    _UMASK = np.uint32(0x80000000)
    _LMASK = np.uint32(0x7FFFFFFF)

    def __init__(self, seed: int = 0):
        self.manual_seed(seed)

    def manual_seed(self, seed: int) -> None:
        state = np.zeros(self._N, dtype=np.uint32)
        state[0] = np.uint32(seed & 0xFFFFFFFF)
        for j in range(1, self._N):
            prev = state[j - 1]
            state[j] = np.uint32(
                (np.uint64(1812433253) * np.uint64(prev ^ (prev >> np.uint32(30))) + np.uint64(j))
                & np.uint64(0xFFFFFFFF)
            )
        self.state = state
        self._pool = np.empty(0, dtype=np.uint32)  # tempered, not-yet-consumed
        self.has_next_gauss = False
        self.next_gauss = 0.0

    def _next_state(self) -> None:
        """One MT19937 twist. Wrapped reads (index i+M-N and the final mt[0])
        must see *new* values; the dependency distance is N-M=227, so three
        chunked vector passes resolve it."""
        N, M = self._N, self._M
        old = self.state
        new = np.empty(N, dtype=np.uint32)
        nxt = np.concatenate([old[1:], old[:1]])  # old[i+1]; last slot patched below
        mixed = (old & self._UMASK) | (nxt & self._LMASK)
        twisted = (mixed >> np.uint32(1)) ^ np.where(nxt & np.uint32(1), self._MATRIX_A, np.uint32(0))
        new[: N - M] = old[M:] ^ twisted[: N - M]                       # i = 0..226
        new[N - M : 2 * (N - M)] = new[: N - M] ^ twisted[N - M : 2 * (N - M)]  # 227..453
        new[2 * (N - M) : N - 1] = new[N - M : N - 1 - (N - M)] ^ twisted[2 * (N - M) : N - 1]  # 454..622
        # i = 623: twist(old[623], new[0]) and xor with new[396]
        y = (old[N - 1] & self._UMASK) | (new[0] & self._LMASK)
        new[N - 1] = new[M - 1] ^ (y >> np.uint32(1)) ^ (self._MATRIX_A if (new[0] & 1) else np.uint32(0))
        self.state = new

    @staticmethod
    def _temper(y: np.ndarray) -> np.ndarray:
        y = y ^ (y >> np.uint32(11))
        y = y ^ ((y << np.uint32(7)) & np.uint32(0x9D2C5680))
        y = y ^ ((y << np.uint32(15)) & np.uint32(0xEFC60000))
        y = y ^ (y >> np.uint32(18))
        return y

    def _rand_uint32_batch(self, n: int) -> np.ndarray:
        chunks = []
        have = len(self._pool)
        while have < n:
            self._next_state()
            chunks.append(self._temper(self.state))
            have += self._N
        if chunks:
            self._pool = np.concatenate([self._pool] + chunks)
        out, self._pool = self._pool[:n], self._pool[n:]
        return out

    def _uniform_from_u32(self, vals: np.ndarray) -> np.ndarray:
        # float path: 24-bit mantissa
        mask = np.uint32((1 << 24) - 1)
        divisor = np.float32(1.0 / (1 << 24))
        return (vals & mask).astype(np.float32) * divisor

    def _uniform_double(self) -> float:
        pair = self._rand_uint32_batch(2)
        val = (np.uint64(pair[0]) << np.uint64(32)) | np.uint64(pair[1])
        mask = np.uint64((1 << 53) - 1)
        divisor = 1.0 / (1 << 53)
        return float(val & mask) * divisor

    def _normal_double(self) -> float:
        if self.has_next_gauss:
            self.has_next_gauss = False
            return self.next_gauss
        u1 = self._uniform_double()
        u2 = self._uniform_double()
        r = np.sqrt(-2.0 * np.log1p(-u2))
        theta = 2.0 * np.pi * u1
        self.next_gauss = r * np.sin(theta)
        self.has_next_gauss = True
        return r * np.cos(theta)

    @staticmethod
    def _normal_fill_16(data: np.ndarray) -> None:
        # Transcendentals emulate correctly-rounded float32 libm (glibc logf/
        # cosf/sinf) by computing in float64 and rounding once.
        # torch: radius = sqrtf(-2*logf(u1)) in float32, but theta promotes to
        # double (2.0f * pi<double> * u2) and the radius*cos(theta) product is
        # computed in double, rounded once at the store.
        u1 = np.float32(1.0) - data[:8].copy()
        u2 = data[8:16].copy()
        logu = np.log(u1.astype(np.float64)).astype(np.float32)
        r = np.sqrt(np.float32(-2.0) * logu).astype(np.float64)
        theta = 2.0 * np.pi * u2.astype(np.float64)
        data[:8] = (r * np.cos(theta)).astype(np.float32)
        data[8:16] = (r * np.sin(theta)).astype(np.float32)

    def randn(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.float32)
        if n >= 16:
            out[:] = self._uniform_from_u32(self._rand_uint32_batch(n))
            for i in range(0, n - 15, 16):
                self._normal_fill_16(out[i : i + 16])
            if n % 16 != 0:
                tail = self._uniform_from_u32(self._rand_uint32_batch(16))
                self._normal_fill_16(tail)
                out[n - 16 :] = tail
        else:
            for i in range(n):
                out[i] = np.float32(self._normal_double())
        return out

    def randn_shape(self, shape) -> np.ndarray:
        n = int(np.prod(shape))
        return self.randn(n).reshape(shape)


class TorchCPURNG:
    """Bit-exact comfyui-compatible stream via torch's own CPU generator.

    comfyui noise is ``torch.randn`` on a seeded CPU generator; torch's float32
    path uses Sleef-vectorized transcendentals that plain numpy cannot
    reproduce to the ulp, so when torch is importable we delegate to it.
    MT19937RNG above is the torch-free fallback (≤1-ulp difference).
    """

    def __init__(self, seed: int = 0):
        import torch

        self._torch = torch
        self._gen = torch.Generator(device="cpu")
        self.manual_seed(seed)

    def manual_seed(self, seed: int) -> None:
        self._gen.manual_seed(int(seed) & 0xFFFFFFFFFFFFFFFF)

    def randn(self, n: int) -> np.ndarray:
        return self._torch.randn(n, generator=self._gen).numpy()

    def randn_shape(self, shape) -> np.ndarray:
        n = int(np.prod(shape))
        return self.randn(n).reshape(shape)


class NumpyRNG:
    """Fast non-compat RNG (reference STDDefaultRNG analog, src/core/rng.hpp:13)."""

    def __init__(self, seed: int = 0):
        self.manual_seed(seed)

    def manual_seed(self, seed: int) -> None:
        self._g = np.random.default_rng(seed)

    def randn(self, n: int) -> np.ndarray:
        return self._g.standard_normal(n, dtype=np.float32)

    def randn_shape(self, shape) -> np.ndarray:
        return self._g.standard_normal(shape, dtype=np.float32)


def _cpu_rng(seed: int = 0):
    try:
        return TorchCPURNG(seed)
    except ImportError:
        return MT19937RNG(seed)


RNG_TYPES = {
    "cuda": PhiloxRNG,  # webui-compatible (reference default)
    "cpu": _cpu_rng,  # comfyui-compatible
    "std_default": NumpyRNG,
}


def create_rng(kind: str, seed: int = 0):
    if kind not in RNG_TYPES:
        raise ValueError(f"unknown rng type {kind!r}; choose from {sorted(RNG_TYPES)}")
    return RNG_TYPES[kind](seed)

"""Denoiser + sigma scheduler parity tests."""
import numpy as np
import pytest

from sdtpu.diffusion.denoiser import (
    CompVisDenoiser,
    CompVisVDenoiser,
    DiscreteFlowDenoiser,
    FluxFlowDenoiser,
)
from sdtpu.diffusion.schedule import SCHEDULERS, get_sigmas


def test_compvis_sigma_table_endpoints():
    d = CompVisDenoiser()
    # canonical SD1.x DDPM sigma extremes
    assert abs(d.sigma_max() - 14.6146) < 1e-3
    assert abs(d.sigma_min() - 0.0292) < 1e-3


def test_compvis_sigma_t_roundtrip():
    d = CompVisDenoiser()
    for t in [0.0, 10.5, 500.0, 999.0]:
        sigma = d.t_to_sigma(np.float32(t))
        t_back = d.sigma_to_t(sigma)
        assert abs(float(t_back) - t) < 1e-2


def test_compvis_scalings():
    d = CompVisDenoiser()
    c_skip, c_out, c_in = d.get_scalings(np.float32(2.0))
    assert c_skip == 1.0
    assert c_out == -2.0
    assert abs(c_in - 1 / np.sqrt(5.0)) < 1e-6
    v = CompVisVDenoiser()
    c_skip, c_out, c_in = v.get_scalings(np.float32(2.0))
    assert abs(c_skip - 1 / 5.0) < 1e-6
    assert abs(c_out + 2 / np.sqrt(5.0)) < 1e-6


def test_flow_denoisers():
    d = DiscreteFlowDenoiser(shift=3.0)
    assert 0.0 < d.sigma_min() < d.sigma_max() <= 1.0
    f = FluxFlowDenoiser(shift=1.15)
    s = f.t_to_sigma(np.float32(999.0))
    assert abs(float(s) - 1.0) < 1e-5  # t=999 → t/1000=1 → shift(1)=1
    lat = np.ones((2, 2), np.float32) * 0.5
    noise = np.ones((2, 2), np.float32)
    noised = d.noise_scaling(np.float32(0.25), noise, lat)
    np.testing.assert_allclose(noised, 0.5 * 0.75 + 0.25)


@pytest.mark.parametrize("name", sorted(SCHEDULERS))
@pytest.mark.parametrize("n", [4, 10, 20])
def test_scheduler_properties(name, n):
    d = CompVisDenoiser() if name not in ("flux", "flux2", "sefi", "ltx2", "logit_normal") else FluxFlowDenoiser()
    sig = get_sigmas(d, n, scheduler=name, version="sd1", image_seq_len=4096)
    if name == "sefi":
        # sefi terminates on the quantized 1000-grid, not exactly 0
        assert sig[-1] == 1.0 / 1000.0
    else:
        assert sig[-1] == 0.0
    assert np.all(sig[:-1] > 0)
    diffs = np.diff(sig[:-1])
    assert np.all(diffs <= 1e-5), f"{name} not descending: {sig}"
    if name != "beta":  # beta dedups equal timesteps
        assert len(sig) == n + 1


def test_karras_values():
    d = CompVisDenoiser()
    sig = get_sigmas(d, 10, scheduler="karras")
    # endpoints are sigma_max / sigma_min
    assert abs(sig[0] - d.sigma_max()) < 1e-4
    assert abs(sig[9] - d.sigma_min()) < 1e-4
    # karras formula spot check at i=5
    rho = 7.0
    want = (d.sigma_max() ** (1 / rho) + 5 / 9 * (d.sigma_min() ** (1 / rho) - d.sigma_max() ** (1 / rho))) ** rho
    assert abs(sig[5] - want) < 1e-4


def test_ays_exact_table():
    d = CompVisDenoiser()
    sig = get_sigmas(d, 10, scheduler="ays", version="sd1")
    assert abs(sig[0] - 14.6146412293) < 1e-5
    assert sig[10] == 0.0
    assert abs(sig[9] - 0.1515232662) < 1e-5


def test_gits_exact_table():
    d = CompVisDenoiser()
    sig = get_sigmas(d, 10, scheduler="gits")
    assert len(sig) == 11
    assert abs(sig[0] - 14.61464119) < 1e-5
    assert sig[10] == 0.0


def test_discrete_first_sigma_is_max():
    d = CompVisDenoiser()
    sig = get_sigmas(d, 20, scheduler="discrete")
    assert abs(sig[0] - d.sigma_max()) < 1e-4


def test_flux_schedule_shift():
    f = FluxFlowDenoiser()
    sig = get_sigmas(f, 20, scheduler="flux", image_seq_len=4096)
    assert abs(sig[0] - 1.0) < 1e-6
    assert sig[-1] == 0.0


def test_unknown_scheduler_raises():
    with pytest.raises(ValueError):
        get_sigmas(CompVisDenoiser(), 10, scheduler="nope")

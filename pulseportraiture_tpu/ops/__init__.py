"""Numerical core: Fourier-domain portrait algebra (L1 of SURVEY.md).

All functions are pure, shape-static, dtype-following, and jit/vmap-safe.
"""

from pulseportraiture_tpu.ops.transform import (
    phase_shifts,
    phase_shifts_deriv,
    phasor,
    phase_transform,
    DM_delay,
    guess_fit_freq,
    GM_from_DMc,
    DMc_from_GM,
)
from pulseportraiture_tpu.ops.rotate import (
    rotate_portrait,
    rotate_portrait_full,
    rotate_profile,
    rotate_data,
    fft_rotate,
    add_DM_nu,
)
from pulseportraiture_tpu.ops.scattering import (
    scattering_times,
    scattering_profile_FT,
    scattering_portrait_FT,
    scattering_kernel,
    add_scattering,
)
from pulseportraiture_tpu.ops.gaussian import (
    gaussian_function,
    gaussian_profile,
    gaussian_profile_FT,
    instrumental_response_FT,
    instrumental_response_port_FT,
)
from pulseportraiture_tpu.ops.noise import (
    get_noise,
    get_noise_PS,
    get_SNR,
    get_red_chi2,
)
from pulseportraiture_tpu.ops.normalize import normalize_portrait

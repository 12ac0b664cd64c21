"""Model builders (L3 of SURVEY.md): Gaussian components and PCA+splines."""

from pulseportraiture_tpu.models.gaussian import (
    gen_gaussian_profile,
    gen_gaussian_portrait,
    evolve_parameter,
    power_law_evolution,
    linear_evolution,
    fit_gaussian_profile,
    fit_gaussian_portrait,
)
from pulseportraiture_tpu.models.gmodel_io import read_model, write_model
from pulseportraiture_tpu.models.spline import (
    pca,
    reconstruct_portrait,
    gen_spline_portrait,
    splev,
    fit_parametric_spline,
)
from pulseportraiture_tpu.models.spline_io import (read_spline_model,
                                                   write_spline_model)
from pulseportraiture_tpu.models.wavelet import (swt, iswt, wavelet_smooth,
                                                 smart_smooth)

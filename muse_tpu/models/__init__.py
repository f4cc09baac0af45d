from .bandpower import band_edges, bandpower_mle, bandpower_problem
from .funnel import funnel_problem, vector_funnel_problem, funnel_analytic_H
from .grf import (GrfConfig, grf_field_problem, grf_marginal_mle,
                  grf_problem, grf_spectral_problem, hermitian_white_packed)
from .lensing import lensing_problem

__all__ = ["funnel_problem", "vector_funnel_problem", "funnel_analytic_H",
           "GrfConfig", "grf_problem", "grf_field_problem",
           "grf_spectral_problem", "hermitian_white_packed",
           "grf_marginal_mle", "lensing_problem",
           "band_edges", "bandpower_mle", "bandpower_problem"]

from .funnel import funnel_problem, vector_funnel_problem, funnel_analytic_H

__all__ = ["funnel_problem", "vector_funnel_problem", "funnel_analytic_H"]

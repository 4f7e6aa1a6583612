from .rolling_ols import rolling_ols_grouped  # noqa: F401
from .rolling_cov import rolling_pairwise_cov  # noqa: F401
from .covariance import assemble_covariance  # noqa: F401
from .portfolio import optimize_portfolio, solve_qp_simplex  # noqa: F401

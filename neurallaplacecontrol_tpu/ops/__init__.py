"""TPU-native numerical operators: inverse Laplace transforms, Riemann-sphere
stereographic maps, and fixed/adaptive ODE integrators."""

from .sphere import (  # noqa: F401
    complex_to_spherical,
    spherical_to_complex,
)
from .ilt import (  # noqa: F401
    ilt_query_points,
    ilt_combine,
    inverse_laplace,
    laplace_reconstruct,
    ILT_ALGORITHMS,
)
from .integrate import euler_step, rk4_step, odeint_fixed, odeint_dopri5  # noqa: F401

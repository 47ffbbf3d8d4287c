from subcort_tpu.registration.driver import (  # noqa: F401
    RegistrationError,
    register_masks,
)
from subcort_tpu.registration.jax_backend import (  # noqa: F401
    load_cpp_grid,
    resample_through_affine,
    resample_through_cpp,
)

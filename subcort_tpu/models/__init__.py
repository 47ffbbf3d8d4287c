from subcort_tpu.models.triplanar import (  # noqa: F401
    TriPlanarSpec,
    apply,
    apply_branch,
    init_params,
    num_params,
    predict,
    predict_proba,
    predict_proba_chunked,
    update_bn_ema,
)
from subcort_tpu.models.importer import load_theano_checkpoint  # noqa: F401

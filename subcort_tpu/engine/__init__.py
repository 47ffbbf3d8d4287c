from subcort_tpu.engine.data import (  # noqa: F401
    Subject,
    TrainingIndex,
    build_training_index,
    generate_training_set,
    leave_one_out,
    list_training_subjects,
    load_data,
)
from subcort_tpu.engine.infer import (  # noqa: F401
    SegmentationEngine,
    load_test_names,
    segment_volume,
    test_scan,
)
from subcort_tpu.engine.loo import evaluate_fold, fold_view, run_loo  # noqa: F401
from subcort_tpu.engine.postprocess import post_process_segmentation  # noqa: F401
from subcort_tpu.engine.train import Trainer, train_split_stratified  # noqa: F401

from rau_vqa_tpu.eval.predict import make_predict_step, compute_answers, mc_mask  # noqa: F401
from rau_vqa_tpu.eval.submission import submission_filename, write_results  # noqa: F401
from rau_vqa_tpu.eval.metrics import fast_val_accuracy  # noqa: F401
# NOT named `vqa_accuracy`: that would shadow the submodule attribute of
# the same name on this package
from rau_vqa_tpu.eval.vqa_accuracy import evaluate as official_accuracy  # noqa: F401

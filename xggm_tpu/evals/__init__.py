from xggm_tpu.evals.gqa_eval import GQAEval, ood_test_report, tail_size_sweep
from xggm_tpu.evals.vqa_eval import VQAOfficialEval, normalize_answer

from xggm_tpu.training.bert_adam import bert_adam, warmup_linear, warmup_cosine, warmup_constant

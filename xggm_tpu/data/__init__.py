from xggm_tpu.data.tokenizer import BertTokenizer, encode_batch

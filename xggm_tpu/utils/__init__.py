from xggm_tpu.utils.io import load_json, save_json, load_pickle, save_pickle

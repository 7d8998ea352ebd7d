from xggm_tpu.models.lxmert import LxmertModel, AnswerHead
from xggm_tpu.models.task_model import XGGMModel, PlainModel

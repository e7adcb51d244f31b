from rau_vqa_tpu.models.cells import (  # noqa: F401
    deep_lstm_init,
    deep_lstm_cell,
    att_lstm_init,
    att_lstm_cell,
    dropout,
)
from rau_vqa_tpu.models.rau import (  # noqa: F401
    init_params,
    encode_question,
    answering_unit,
    rau_forward,
    RAUOutput,
)

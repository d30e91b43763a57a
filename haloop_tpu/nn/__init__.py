from haloop_tpu.nn.core import (
    Param,
    linear_init,
    linear,
    layer_norm_init,
    layer_norm,
    embedding_init,
    embedding,
    conv1d_init,
    conv1d,
    new_gelu,
    dropout,
)
from haloop_tpu.nn.lstm import lstm_init, lstm, lstm_cell, multilayer_lstm

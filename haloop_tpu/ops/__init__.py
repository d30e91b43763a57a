from haloop_tpu.ops.semiring import NEG_INF, logaddexp, logsubexp, logsumexp
from haloop_tpu.ops.scan import (
    scan,
    scanrec,
    scanrec_log,
    scanrec_sequential,
    scanrec_log_sequential,
)
from haloop_tpu.ops.ctc import ctc_forward_score, ctc_loss, ctc_reduce_mean
from haloop_tpu.ops.star import (
    star_ctc_forward_score,
    intersperse_blanks,
    intersperse_stars,
)
from haloop_tpu.ops.transducer import (
    transducer_forward_score,
    transducer_forward_score_sequential,
)

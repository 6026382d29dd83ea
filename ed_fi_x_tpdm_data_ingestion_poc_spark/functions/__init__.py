"""Engine function library: scalar expressions (this package) plus the
text/sketch expression families re-exported from operators for a single
import surface."""

from ..operators.text import (  # noqa: F401
    bpe_ish_tokens,
    fingerprint_md5,
    fingerprint_rolling,
    lang_id,
    mean_token_len,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
from .scalars import (  # noqa: F401
    descriptor_uri,
    equality_filter,
    iso_date,
    iso_timestamp,
    null_if_sentinel,
    paginate,
)

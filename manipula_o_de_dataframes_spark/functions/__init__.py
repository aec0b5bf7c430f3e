from .formatting import (  # noqa: F401
    brl,
    pct,
    week_label,
    render_list,
    parse_date,
    format_date,
    to_number,
    dsum,
    dsum_dec,
)
from .text import (  # noqa: F401
    token_count,
    tokens,
    quality_score,
    lang_id,
    fingerprint,
)

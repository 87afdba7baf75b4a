from .cleaning import (  # noqa: F401
    ad_id_from_link,
    clean_dexters_distance_m,
    clean_dexters_price,
    clean_tube_stop_string,
    distance_km_from_miles,
    distance_km_from_metres,
    extract_int,
    has_numbers,
    is_valid_price,
    l1_distance,
    haversine_km,
    none_string_to_null,
    split_miles,
    strip_tube,
    get_tube_dist,
    sub_values,
    to_num,
    victoria_clean_stop,
    yes_no,
)
from .text import (  # noqa: F401
    doc_fingerprint,
    lang_id_scores,
    quality_score,
    token_count,
)
from .vectors import cosine_similarity, dot_product, l2_norm  # noqa: F401

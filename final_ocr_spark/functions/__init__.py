from final_ocr_spark.functions.parsing import (  # noqa: F401
    extract_date_str,
    extract_id,
    extract_section,
    extract_total_amount,
    first_match,
    normalize_date,
)
from final_ocr_spark.functions.numbers import normalize_number  # noqa: F401
from final_ocr_spark.functions.validate import (  # noqa: F401
    completeness_score,
    net_repair,
    totals_additivity_ok,
)

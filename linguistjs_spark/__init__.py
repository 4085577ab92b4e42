"""linguistjs_spark — a PySpark-native language-ID + quality-filter +
PII/toxicity-scrub engine with the query capabilities of Nixinova/LinguistJS,
re-expressed Spark-first (DataFrame/Catalyst), built for Common-Crawl-scale
web-page tables.

Reference: /root/reference (linguist-js v2.9.2). See SURVEY.md for the
operator-by-operator mapping.
"""

from .config import DEFAULT_CONFIG, REFERENCE_PARITY_CONFIG, QualityFilterConfig
from .metadata import load_metadata
from .oracle import analyse_document

__all__ = [
    "QualityFilterConfig",
    "DEFAULT_CONFIG",
    "REFERENCE_PARITY_CONFIG",
    "load_metadata",
    "analyse_document",
]
__version__ = "0.1.0"

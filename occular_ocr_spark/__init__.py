"""occular_ocr_spark — a brand-new PySpark-native main-content extraction
engine replaying the document→text contract of Bodhi42/Occular-ocr over
tables of multi-turn agent transcripts (BASELINE.json north_rule).

Public API (the analog of the reference's simple/advanced façade,
``ocr_skel/__init__.py:58-135``):

* ``extract_text(df)``       -> DataFrame[conv_id, turn_idx, text]
* ``extract_detailed(df)``   -> DataFrame[conv_id, turn_idx, method, blocks,
                                text, lineage...]
* ``conversation_text(df)``  -> DataFrame[conv_id, text, n_turns]
  (whole-conversation assembly under stable turn ordering)
"""

from .extraction.core import EXTRACTOR_VERSION  # noqa: F401
from .job import conversation_text, extract_detailed, extract_text  # noqa: F401

__version__ = "0.1.0"

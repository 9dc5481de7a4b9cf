"""PySpark-native OCR proofreading engine.

A brand-new, idiomatic-Spark implementation of the computed semantics of
``porcpine1967/ocr-proofreader`` (reference checkout was empty at survey
time; the frozen rule-set in SURVEY.md section 2.3 + ``oracle/refsem.py``
stand in as the reference semantics — see SURVEY.md section 0).
"""

__version__ = "0.1.0"

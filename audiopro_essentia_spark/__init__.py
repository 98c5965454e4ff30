"""audiopro_essentia_spark — a from-scratch PySpark-native windowed
feature-engineering engine with the computational semantics of
parsasabetz/audiopro_essentia (reference at /root/reference, studied for
behavior only), re-expressed for Iceberg/Parquet tables of pre-tokenized
training sequences at 10^12-sequence scale.
"""

__version__ = "0.1.0"

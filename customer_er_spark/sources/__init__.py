"""Source/sink layer: schema-enforced readers and writers.

Reference analogs: CSV scan with header+inferSchema
(/root/reference/01_Prepare_Data.py:161-170), Delta path/table scans
(02B:250-260), Delta sinks with overwriteSchema (01:173-180).  Here the
catalog (customer_er_spark.catalog) is the primary sink; these readers
bring external data into the images schema.
"""

from customer_er_spark.sources.readers import (  # noqa: F401
    IMAGES_SCHEMA,
    images_to_csv,
    read_images,
    validate_images_schema,
)

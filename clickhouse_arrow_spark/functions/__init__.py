from clickhouse_arrow_spark.functions.ch_functions import *  # noqa: F401,F403
from clickhouse_arrow_spark.functions.ch_functions import __all__  # noqa: F401

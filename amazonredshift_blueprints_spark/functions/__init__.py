"""Scalar-function helpers: Redshift-dialect compatibility shims.

The reference forwards user SQL verbatim to Redshift
(store_query_results.py:103, execute_sql.py:77), so users write Redshift
dialect. Spark SQL covers almost all of it natively; the deltas
(DATEDIFF arg order, GETDATE) are handled by a pre-``spark.sql`` string
translation — cheaper and more transparent than a Catalyst rule
(SURVEY.md §4.2).
"""

from .redshift_compat import translate_redshift_sql

__all__ = ["translate_redshift_sql"]

"""Results / reporting: pandas dataframes, aggregation, LaTeX export."""

from .tables import results_dataframe, agg_results, export_losses  # noqa: F401
from .texify import TexTab, texify_test_results_df  # noqa: F401

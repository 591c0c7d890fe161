from .writers import (AssignmentRecord, write_assignments, read_assignments,
                      summarize, write_summary, merge_cohort,
                      write_cohort_summary)
from . import stats

__all__ = ["AssignmentRecord", "write_assignments", "read_assignments",
           "summarize", "write_summary", "merge_cohort",
           "write_cohort_summary", "stats"]

"""DataFrame→DataFrame operators: each returns a lazy DataFrame plan."""

"""Sources and sinks: seed lists/files, the pages table, results sinks."""

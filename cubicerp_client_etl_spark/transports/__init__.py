"""File transports (SURVEY A7/I6): staged driver-side movement of whole
files between remote endpoints and the local spool the Spark readers
and single-file writers operate on."""

package graft

/** The fixed 29-column AWS ALB access-log schema.
  *
  * Declared, never inferred (SURVEY.md §1.3). Column list mirrors the AWS
  * documentation ordering used by the reference (reference elb_logs.py:44-53).
  */
object ElbSchema {
  val columns: Seq[String] = Seq(
    "type", "time", "elb", "client_ip_port", "target_ip_port",
    "request_processing_time", "target_processing_time", "response_processing_time",
    "elb_status_code", "target_status_code", "received_bytes", "sent_bytes",
    "request", "user_agent", "ssl_cipher", "ssl_protocol",
    "target_group_arn", "trace_id", "domain_name", "chosen_cert_arn",
    "matched_rule_priority", "request_creation_time", "actions_executed",
    "redirect_url", "error_reason", "target_port_list", "target_status_code_list",
    "classification", "classification_reason")

  /** Columns coerced to double; `'-'` is the missing sentinel
    * (reference elb_logs.py:91-95). A non-sentinel, non-parseable value
    * drops the whole row (the reference's float() raises → row → None).
    */
  val floatColumns: Seq[String] =
    Seq("request_processing_time", "target_processing_time", "response_processing_time")

  /** Columns coerced to long iff the token is all-digits — the reference's
    * `isdigit()` rule (elb_logs.py:96-97) rejects signs, so negatives stay
    * null; non-digit values null out without dropping the row.
    */
  val intColumns: Seq[String] =
    Seq("elb_status_code", "target_status_code", "received_bytes", "sent_bytes")
}

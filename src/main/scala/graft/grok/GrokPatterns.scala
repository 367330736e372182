package graft.grok

/** Grok pattern library.
  *
  * `defaults` is the standard logstash/grok base pattern set, as shipped
  * (identically) by the reference's vendored library —
  * `/root/reference/vendor/github.com/vjeantet/grok/patterns.go:3-80`.
  * These are public, widely-replicated pattern *data* (not code); they
  * are reproduced here because pattern composition (`%{NAME}`) must
  * resolve against the same library to match reference semantics.
  *
  * `application` is the reference's own 7 patterns
  * (`/root/reference/main.go:558-566`): `GENERIC` is the only one
  * exercised at runtime; the rest are dormant routes whose *intent*
  * (typed named captures) we support per SURVEY.md §2.2.
  */
object GrokPatterns {

  val defaults: Map[String, String] = Map(
    "USERNAME" -> """[a-zA-Z0-9._-]+""",
    "USER" -> """%{USERNAME}""",
    "EMAILLOCALPART" -> """[a-zA-Z][a-zA-Z0-9_.+-=:]+""",
    "EMAILADDRESS" -> """%{EMAILLOCALPART}@%{HOSTNAME}""",
    "HTTPDUSER" -> """%{EMAILADDRESS}|%{USER}""",
    "INT" -> """(?:[+-]?(?:[0-9]+))""",
    "BASE10NUM" -> """([+-]?(?:[0-9]+(?:\.[0-9]+)?)|\.[0-9]+)""",
    "NUMBER" -> """(?:%{BASE10NUM})""",
    "BASE16NUM" -> """(0[xX]?[0-9a-fA-F]+)""",
    "POSINT" -> """\b(?:[1-9][0-9]*)\b""",
    "NONNEGINT" -> """\b(?:[0-9]+)\b""",
    "WORD" -> """\b\w+\b""",
    "NOTSPACE" -> """\S+""",
    "SPACE" -> """\s*""",
    "DATA" -> """.*?""",
    "GREEDYDATA" -> """.*""",
    "QUOTEDSTRING" -> """"([^"\\]*(\\.[^"\\]*)*)"|\'([^\'\\]*(\\.[^\'\\]*)*)\'""",
    "UUID" -> """[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}""",
    "MAC" -> """(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})""",
    "CISCOMAC" -> """(?:(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4})""",
    "WINDOWSMAC" -> """(?:(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2})""",
    "COMMONMAC" -> """(?:(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2})""",
    "IPV6" -> """((([0-9A-Fa-f]{1,4}:){7}([0-9A-Fa-f]{1,4}|:))|(([0-9A-Fa-f]{1,4}:){6}(:[0-9A-Fa-f]{1,4}|((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3})|:))|(([0-9A-Fa-f]{1,4}:){5}(((:[0-9A-Fa-f]{1,4}){1,2})|:((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3})|:))|(([0-9A-Fa-f]{1,4}:){4}(((:[0-9A-Fa-f]{1,4}){1,3})|((:[0-9A-Fa-f]{1,4})?:((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))|(([0-9A-Fa-f]{1,4}:){3}(((:[0-9A-Fa-f]{1,4}){1,4})|((:[0-9A-Fa-f]{1,4}){0,2}:((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))|(([0-9A-Fa-f]{1,4}:){2}(((:[0-9A-Fa-f]{1,4}){1,5})|((:[0-9A-Fa-f]{1,4}){0,3}:((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))|(([0-9A-Fa-f]{1,4}:){1}(((:[0-9A-Fa-f]{1,4}){1,6})|((:[0-9A-Fa-f]{1,4}){0,4}:((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))|(:(((:[0-9A-Fa-f]{1,4}){1,7})|((:[0-9A-Fa-f]{1,4}){0,5}:((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:)))(%.+)?""",
    "IPV4" -> """(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)""",
    "IP" -> """(?:%{IPV6}|%{IPV4})""",
    "HOSTNAME" -> """\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*(\.?|\b)""",
    "HOST" -> """%{HOSTNAME}""",
    "IPORHOST" -> """(?:%{IP}|%{HOSTNAME})""",
    "HOSTPORT" -> """%{IPORHOST}:%{POSINT}""",
    "PATH" -> """(?:%{UNIXPATH}|%{WINPATH})""",
    "UNIXPATH" -> """(/[\w_%!$@:.,-]?/?)(\S+)?""",
    "TTY" -> """(?:/dev/(pts|tty([pq])?)(\w+)?/?(?:[0-9]+))""",
    "WINPATH" -> """([A-Za-z]:|\\)(?:\\[^\\?*]*)+""",
    "URIPROTO" -> """[A-Za-z]+(\+[A-Za-z+]+)?""",
    "URIHOST" -> """%{IPORHOST}(?::%{POSINT:port})?""",
    "URIPATH" -> """(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%_\-]*)+""",
    "URIPARAM" -> """\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*""",
    "URIPATHPARAM" -> """%{URIPATH}(?:%{URIPARAM})?""",
    "URI" -> """%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?""",
    "MONTH" -> """\b(?:Jan(?:uary|uar)?|Feb(?:ruary|ruar)?|M(?:a|ä)?r(?:ch|z)?|Apr(?:il)?|Ma(?:y|i)?|Jun(?:e|i)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|O(?:c|k)?t(?:ober)?|Nov(?:ember)?|De(?:c|z)(?:ember)?)\b""",
    "MONTHNUM" -> """(?:0?[1-9]|1[0-2])""",
    "MONTHNUM2" -> """(?:0[1-9]|1[0-2])""",
    "MONTHDAY" -> """(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])""",
    "DAY" -> """(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)""",
    "YEAR" -> """(\d\d){1,2}""",
    "HOUR" -> """(?:2[0123]|[01]?[0-9])""",
    "MINUTE" -> """(?:[0-5][0-9])""",
    "SECOND" -> """(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)""",
    "TIME" -> """([^0-9]?)%{HOUR}:%{MINUTE}(?::%{SECOND})([^0-9]?)""",
    "DATE_US" -> """%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}""",
    "DATE_EU" -> """%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}""",
    "ISO8601_TIMEZONE" -> """(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))""",
    "ISO8601_SECOND" -> """(?:%{SECOND}|60)""",
    "TIMESTAMP_ISO8601" -> """%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?""",
    "DATE" -> """%{DATE_US}|%{DATE_EU}""",
    "DATESTAMP" -> """%{DATE}[- ]%{TIME}""",
    "TZ" -> """(?:[PMCE][SD]T|UTC)""",
    "DATESTAMP_RFC822" -> """%{DAY} %{MONTH} %{MONTHDAY} %{YEAR} %{TIME} %{TZ}""",
    "DATESTAMP_RFC2822" -> """%{DAY}, %{MONTHDAY} %{MONTH} %{YEAR} %{TIME} %{ISO8601_TIMEZONE}""",
    "DATESTAMP_OTHER" -> """%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{TZ} %{YEAR}""",
    "DATESTAMP_EVENTLOG" -> """%{YEAR}%{MONTHNUM2}%{MONTHDAY}%{HOUR}%{MINUTE}%{SECOND}""",
    "HTTPDERROR_DATE" -> """%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{YEAR}""",
    "SYSLOGTIMESTAMP" -> """%{MONTH} +%{MONTHDAY} %{TIME}""",
    "PROG" -> """[\x21-\x5a\x5c\x5e-\x7e]+""",
    "SYSLOGPROG" -> """%{PROG:program}(?:\[%{POSINT:pid}\])?""",
    "SYSLOGHOST" -> """%{IPORHOST}""",
    "SYSLOGFACILITY" -> """<%{NONNEGINT:facility}.%{NONNEGINT:priority}>""",
    "HTTPDATE" -> """%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}""",
    "QS" -> """%{QUOTEDSTRING}""",
    "SYSLOGBASE" -> """%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:""",
    "COMMONAPACHELOG" -> """%{IPORHOST:clientip} %{HTTPDUSER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\] "(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" %{NUMBER:response} (?:%{NUMBER:bytes}|-)""",
    "COMBINEDAPACHELOG" -> """%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}""",
    "HTTPD20_ERRORLOG" -> """\[%{HTTPDERROR_DATE:timestamp}\] \[%{LOGLEVEL:loglevel}\] (?:\[client %{IPORHOST:clientip}\] ){0,1}%{GREEDYDATA:errormsg}""",
    "HTTPD24_ERRORLOG" -> """\[%{HTTPDERROR_DATE:timestamp}\] \[%{WORD:module}:%{LOGLEVEL:loglevel}\] \[pid %{POSINT:pid}:tid %{NUMBER:tid}\]( \(%{POSINT:proxy_errorcode}\)%{DATA:proxy_errormessage}:)?( \[client %{IPORHOST:client}:%{POSINT:clientport}\])? %{DATA:errorcode}: %{GREEDYDATA:message}""",
    "HTTPD_ERRORLOG" -> """%{HTTPD20_ERRORLOG}|%{HTTPD24_ERRORLOG}""",
    "LOGLEVEL" -> """([Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)""",
  )

  /** Reference application patterns, `/root/reference/main.go:558-566`. */
  val application: Map[String, String] = Map(
    "GENERIC" -> """%{GREEDYDATA:log_event}""",
    "ROUTERTIME" -> """%{YEAR}-%{MONTHNUM}-%{MONTHDAY}T%{TIME}+%{INT}""",
    "ROUTERACCESS" -> ("""%{HOSTNAME:rtr_hostname} - \[%{ROUTERTIME:rtr_time}\] "%{WORD:rtr_verb} """ +
      """%{URIPATHPARAM:rtr_path} %{PROG:rtr_http_spec}" %{BASE10NUM:rtr_status:int} """ +
      """%{BASE10NUM:rtr_request_bytes_received:int} %{BASE10NUM:rtr_body_bytes_sent:int} """ +
      """"%{GREEDYDATA:rtr_referer}" "%{GREEDYDATA:rtr_http_user_agent}" """ +
      """"%{IPORHOST:rtr_src_host}:%{POSINT:rtr_src_port:int}" """ +
      """"%{IPORHOST:rtr_dst_host}:%{POSINT:rtr_dst_port:int}" """ +
      """x_forwarded_for:"%{GREEDYDATA:rtr_x_forwarded_for}" """ +
      """x_forwarded_proto:"%{GREEDYDATA:rtr_x_forwarded_proto}" """ +
      """vcap_request_id:"%{NOTSPACE:rtr_vcap_request_id}" """ +
      """response_time:%{NUMBER:rtr_response_time_sec:float} """ +
      """app_id:"%{NOTSPACE:rtr_app_id}" app_index:"%{BASE10NUM:rtr_app_index:int}" """ +
      """x_b3_traceid:"%{NOTSPACE:x_b3_traceid}" x_b3_spanid:"%{NOTSPACE:x_b3_spanid}" """ +
      """x_b3_parentspanid:"%{NOTSPACE:x_b3_parentspanid}""""),
    "BOSHTIME" -> """%{MONTHDAY}\/%{MONTH}\/%{YEAR}:%{TIME} +%{INT}""",
    "BOSHDIRECTOROUT" -> """D, \[%{ROUTERTIME:director_time} .*\] %{GREEDYDATA:bosh_director_out}""",
    "BOSHDIRECTORERR" -> """%{IP:client_ip} - - \[%{BOSHTIME:director_time}\] %{GREEDYDATA:bosh_director_err}""",
    "LINUXMESSAGES" -> """%{TIMESTAMP_ISO8601:os_time} %{GREEDYDATA:var_log_messages}""",
  )

  val all: Map[String, String] = defaults ++ application
}

"""SQL fragments shared verbatim between Spark queries and DuckDB oracles.

The driver's correctness gate runs each `queries()[name]` on Spark and the
matching `oracle_sql()[name]` on DuckDB over the same parquet tables. For the
pipeline queries we synthesize audit lines *inside SQL* from `documents.doc_id`
— the identical fragment text runs in both dialects (only `||`, `CASE`,
`CAST(AS STRING)`, `%` are used), so the constructed corpus is provably equal
on both sides and the comparison isolates OUR parse/aggregate semantics.
"""

# deterministic epoch base for synthetic audit timestamps
EPOCH0 = 1700000000

# value domains keyed off doc_id (keep in sync across fragments!)
PERM_CASE = (
    "(case doc_id % 5 when 0 then 'read' when 1 then 'write' "
    "when 2 then 'getattr' when 3 then 'name_connect' else 'signal' end)"
)
COMM_CASE = (
    "(case doc_id % 4 when 0 then 'httpd' when 1 then 'mysqld' "
    "when 2 then 'sshd' else 'python3' end)"
)
SC_TYPE_CASE = (
    "(case doc_id % 4 when 0 then 'httpd_t' when 1 then 'mysqld_t' "
    "when 2 then 'sshd_t' else 'unconfined_t' end)"
)
TC_TYPE_CASE = (
    "(case doc_id % 3 when 0 then 'default_t' when 1 then 'unlabeled_t' "
    "else 'var_log_t' end)"
)
TCLASS_CASE = (
    "(case when doc_id % 5 = 3 then 'tcp_socket' "
    "when doc_id % 5 = 4 then 'process' else 'file' end)"
)
DEST_CASE = (
    "(case doc_id % 3 when 0 then '80' when 1 then '5432' else '9999' end)"
)
PATH_DIR_CASE = (
    "(case doc_id % 6 when 0 then '/var/www/html' when 1 then '/etc' "
    "when 2 then '/home/alice' when 3 then '/tmp' when 4 then '/opt/app' "
    "else '/var/log/app' end)"
)
# full path: <dir>/f<doc_id%10>.dat ; tcp_socket rows have no path
PATH_CASE = (
    f"(case when doc_id % 5 = 3 then cast(null as string) else "
    f"{PATH_DIR_CASE} || '/f' || cast(doc_id % 10 as string) || '.dat' end)"
)
PERMISSIVE_CASE = "(case when doc_id % 7 = 0 then '1' else '0' end)"

SCONTEXT = f"'system_u:system_r:' || {SC_TYPE_CASE} || ':s0'"
TCONTEXT = f"'system_u:object_r:' || {TC_TYPE_CASE} || ':s0'"

# One well-formed AVC line per document row.
SYNTH_LINE = (
    f"'type=AVC msg=audit(' || cast({EPOCH0} + doc_id as string) || '.000:' "
    f"|| cast(doc_id as string) || '): avc:  denied  {{ ' || {PERM_CASE} "
    f"|| ' }} for  pid=' || cast(1000 + doc_id % 97 as string) "
    f"|| ' comm=\"' || {COMM_CASE} || '\"' "
    f"|| (case when doc_id % 5 = 3 then ' dest=' || {DEST_CASE} "
    f"    else ' path=\"' || {PATH_DIR_CASE} || '/f' || cast(doc_id % 10 as string) || '.dat\"' end) "
    f"|| ' scontext=' || {SCONTEXT} "
    f"|| ' tcontext=' || {TCONTEXT} "
    f"|| ' tclass=' || {TCLASS_CASE} "
    f"|| (case when doc_id % 7 = 0 then ' permissive=1' else ' permissive=0' end)"
)

# Variant corpus with deliberate malformed rows (doc_id % 20 = 19 → truncated
# record that fails the validity check → route 'malformed').
SYNTH_LINE_WITH_MALFORMED = (
    f"(case when doc_id % 20 = 19 then "
    f"'type=AVC msg=audit(' || cast({EPOCH0} + doc_id as string) || '.000:' "
    f"|| cast(doc_id as string) || '): avc:  deni' "
    f"else {SYNTH_LINE} end)"
)

# Oracle-side expected values (ground truth by construction).
ORACLE_FIELDS = {
    "permission": PERM_CASE,
    "pid": "cast(1000 + doc_id % 97 as string)",
    "comm": COMM_CASE,
    "path": PATH_CASE,
    "tclass": TCLASS_CASE,
    "sc_type": SC_TYPE_CASE,
    "tc_type": TC_TYPE_CASE,
    "dest_port": f"(case when doc_id % 5 = 3 then {DEST_CASE} else cast(null as string) end)",
    "permissive": PERMISSIVE_CASE,
    "scontext_raw": SCONTEXT,
    "tcontext_raw": TCONTEXT,
    "epoch": f"({EPOCH0} + doc_id)",
}

# --- smart-signature component oracles (mirror enrich/join.py expressions,
#     restricted to this corpus's value domain) -----------------------------

# process_category: httpd→web_server_apache, mysqld→database_mysql,
# sshd→ssh_daemon, python3 (+unconfined_t) → unconfined_python3
PROCESS_CATEGORY_ORACLE = (
    "(case doc_id % 4 when 0 then 'web_server_apache' "
    "when 1 then 'database_mysql' when 2 then 'ssh_daemon' "
    "else 'unconfined_python3' end)"
)
# permission_category: file+read/write/getattr→file_access;
# tcp_socket+name_connect→net_connect; process+signal→process_signal
PERMISSION_CATEGORY_ORACLE = (
    "(case when doc_id % 5 in (0,1,2) then 'file_access' "
    "when doc_id % 5 = 3 then 'net_connect' else 'process_signal' end)"
)
OBJECT_GROUP_ORACLE = (
    "(case when doc_id % 5 = 3 then 'network' "
    "when doc_id % 5 = 4 then 'system' else 'filesystem' end)"
)
# path_pattern for this corpus: tcp rows → no_path. The regex pattern table
# applies regardless of tclass (reference parse_avc.py:1775-1777 matches
# patterns before any class check); only the dirname/* fallback is gated on
# tclass∈{file,dir} — so /opt/app paths split: file→'/opt/app/*',
# process→exact path.
PATH_PATTERN_ORACLE = (
    "(case when doc_id % 5 = 3 then 'no_path' "
    "when doc_id % 6 = 0 then '/var/www(/.*)?' "
    "when doc_id % 6 = 1 then '/etc(/.*)?' "
    "when doc_id % 6 = 2 then '/home/[^/]+(/.*)?' "
    "when doc_id % 6 = 3 then '/tmp(/.*)?' "
    "when doc_id % 6 = 5 then '/var/log(/.*)?' "
    f"when doc_id % 5 = 4 then {PATH_CASE} "
    "else '/opt/app/*' end)"
)

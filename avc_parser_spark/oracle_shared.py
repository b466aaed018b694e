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
PERMISSIVE_CASE = "(case when doc_id % 7 = 0 then '1' else '0' end)"

SCONTEXT = f"'system_u:system_r:' || {SC_TYPE_CASE} || ':s0'"
TCONTEXT = f"'system_u:object_r:' || {TC_TYPE_CASE} || ':s0'"

# --- comm-keyed shared-context domains (multi-record block) ----------------
_PT_CMDS = [
    ("/usr/sbin/httpd", "-DFOREGROUND"),
    ("/usr/sbin/mysqld", "--basedir=/usr"),
    ("/usr/sbin/sshd", "-D"),
    ("/usr/bin/python3", "app.py"),
]


def _case4(vals: list[str]) -> str:
    return (
        f"(case doc_id % 4 when 0 then '{vals[0]}' when 1 then '{vals[1]}' "
        f"when 2 then '{vals[2]}' else '{vals[3]}' end)"
    )


EXE_CASE = _case4([e for e, _ in _PT_CMDS])
# decoded PROCTITLE (NUL→space) == reassembled EXECVE argv by construction
CMDLINE_CASE = _case4([f"{e} {fl}" for e, fl in _PT_CMDS])
PROCTITLE_HEX_CASE = _case4(
    [(e + "\x00" + fl).encode().hex().upper() for e, fl in _PT_CMDS]
)
# cwd domain chosen to hit distinct path-pattern branches on CWD-resolved
# paths: /var/www(/.*)? | /var/lib(/.*)? | /etc(/.*)? | dirname fallback
CWD_CASE = _case4(["/var/www", "/var/lib/mysql", "/etc/ssh", "/srv/app"])
SYSCALL_CASE = (
    "(case when doc_id % 5 = 3 then 'connect' "
    "when doc_id % 5 = 4 then 'kill' else 'openat' end)"
)
EXIT_RAW_CASE = "(case doc_id % 3 when 0 then '-13' when 1 then '-1' else '0' end)"
EXIT_NAME_CASE = (
    "(case doc_id % 3 when 0 then 'EACCES' when 1 then 'EPERM' else 'SUCCESS' end)"
)
SUCCESS_CASE = "(case when doc_id % 3 = 2 then 'yes' else 'no' end)"
SADDR_CASE = (
    "(case doc_id % 3 when 0 then '02000050C0A80001' "
    "when 1 then '02001538C0A80002' else '0200270FC0A80003' end)"
)

# Path-cascade sub-branches (file-class rows only): the AVC line DROPS its
# embedded path= and the value must come from PATH-record best-path selection
# (P12) — for CASCADE_CWD the selected name is relative and must be joined
# against the CWD record (P14). CASCADE_BEST resolves to the same absolute
# path an embedded path= would have carried, so only the *mechanism* differs.
CASCADE_CWD = "(doc_id % 5 in (0, 1, 2) and doc_id % 9 = 5)"
CASCADE_BEST = "(doc_id % 5 in (0, 1, 2) and doc_id % 9 = 7)"

_FNAME = "'f' || cast(doc_id % 10 as string) || '.dat'"
_DIR_PATH = f"{PATH_DIR_CASE} || '/' || {_FNAME}"

# expected resolved path: tcp rows none; CWD-cascade rows cwd-joined;
# everything else the directory path (embedded or via best-path)
PATH_CASE = (
    f"(case when doc_id % 5 = 3 then cast(null as string) "
    f"when {CASCADE_CWD} then {CWD_CASE} || '/' || {_FNAME} "
    f"else {_DIR_PATH} end)"
)


def _aud_line(rtype: str) -> str:
    return (
        f"'type={rtype} msg=audit(' || cast({EPOCH0} + doc_id as string) "
        f"|| '.000:' || cast(doc_id as string) || '): '"
    )


_PT_LINE = f"{_aud_line('PROCTITLE')} || 'proctitle=' || {PROCTITLE_HEX_CASE}"
_SYS_LINE = (
    f"{_aud_line('SYSCALL')} || 'arch=c000003e syscall=' || {SYSCALL_CASE} "
    f"|| ' success=' || {SUCCESS_CASE} || ' exit=' || {EXIT_RAW_CASE} "
    f"|| ' comm=\"' || {COMM_CASE} || '\" exe=\"' || {EXE_CASE} || '\"'"
)
_CWD_LINE = f"{_aud_line('CWD')} || 'cwd=\"' || {CWD_CASE} || '\"'"
_EXECVE_LINE = (
    f"{_aud_line('EXECVE')} || 'argc=2 a0=\"' || {EXE_CASE} "
    f"|| '\" a1=\"' || {_case4([fl for _, fl in _PT_CMDS])} || '\"'"
)
_PATH0_LINE = (
    f"{_aud_line('PATH')} || 'item=0 name=\"' || {PATH_DIR_CASE} "
    f"|| '\" nametype=PARENT inode=' || cast((doc_id % 50) + 2 as string) "
    f"|| ' dev=fd:00'"
)
_PATH1_NAME = (
    f"(case when {CASCADE_CWD} then {_FNAME} else {_DIR_PATH} end)"
)
_PATH1_LINE = (
    f"{_aud_line('PATH')} || 'item=1 name=\"' || {_PATH1_NAME} "
    f"|| '\" nametype=NORMAL inode=' || cast((doc_id % 50) + 3 as string) "
    f"|| ' dev=fd:00'"
)
# interpreted ausearch struct form on even docs (→ saddr_struct column,
# laddr/lport decomposition); raw hex form on odd docs (→ saddr column)
SADDR_STRUCT_CASE = (
    f"'saddr_fam=inet laddr=192.168.1.' || cast(doc_id % 9 as string) "
    f"|| ' lport=' || {DEST_CASE}"
)
_SOCK_LINE = (
    f"{_aud_line('SOCKADDR')} || (case when doc_id % 2 = 0 "
    f"then 'saddr={{ ' || {SADDR_STRUCT_CASE} || ' }}' "
    f"else 'saddr=' || {SADDR_CASE} end)"
)

# P5 — the AVC line's own timestamp cycles through all THREE formats the
# reference accepts (parse_avc.py:900-927): interpreted MM/DD/YYYY and
# DD/MM/YY forms use CONSTANT wall-clock texts (portable across both SQL
# dialects) whose epochs are fixed; everything else is raw-epoch form.
# event_id/host still come from the block's raw-form records (shared
# context), so only event_ts moves.
TS_TEXT = (
    "(case when doc_id % 13 = 1 then '11/14/2023 22:21:33.000' "
    "when doc_id % 13 = 2 then '14/11/23 22:21:34.000' "
    f"else cast({EPOCH0} + doc_id as string) || '.000' end)"
)
# 2023-11-14 22:21:33 UTC = 1700000493; 22:21:34 = 1700000494
EPOCH_CASE = (
    "(case when doc_id % 13 = 1 then 1700000493 "
    "when doc_id % 13 = 2 then 1700000494 "
    f"else {EPOCH0} + doc_id end)"
)

# The AVC denial line. Embedded path= only outside the cascade branches;
# doc_id%11=0 rows additionally carry an AVC exe= that the SYSCALL exe must
# override (P13 priority: SYSCALL exe > AVC exe).
_AVC_LINE = (
    f"'type=AVC msg=audit(' || {TS_TEXT} || ':' "
    f"|| cast(doc_id as string) || '): avc:  denied  {{ ' || {PERM_CASE} "
    f"|| ' }} for  pid=' || cast(1000 + doc_id % 97 as string) "
    f"|| ' comm=\"' || {COMM_CASE} || '\"' "
    f"|| (case when doc_id % 11 = 0 then ' exe=\"/opt/override\"' else '' end) "
    f"|| (case when doc_id % 5 = 3 then ' dest=' || {DEST_CASE} "
    f"    when {CASCADE_CWD} or {CASCADE_BEST} then '' "
    f"    else ' path=\"' || {_DIR_PATH} || '\"' end) "
    f"|| ' scontext=' || {SCONTEXT} "
    f"|| ' tcontext=' || {TCONTEXT} "
    f"|| ' tclass=' || {TCLASS_CASE} "
    f"|| (case when doc_id % 7 = 0 then ' permissive=1' else ' permissive=0' end)"
)

# One full multi-record ausearch-style block per document row:
# PROCTITLE(hex) + SYSCALL + CWD + EXECVE + (PATH×2 | SOCKADDR) + AVC —
# exercises shared context (P3/P4), proctitle hex decode (P8), EXECVE argv
# (P9), best-PATH selection (P12), exe priority (P13), CWD resolution (P14).
SYNTH_LINE = (
    f"{_PT_LINE} || chr(10) || {_SYS_LINE} || chr(10) || {_CWD_LINE} "
    f"|| chr(10) || {_EXECVE_LINE} "
    f"|| (case when doc_id % 5 = 3 then chr(10) || {_SOCK_LINE} "
    f"    else chr(10) || {_PATH0_LINE} || chr(10) || {_PATH1_LINE} end) "
    f"|| chr(10) || {_AVC_LINE}"
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
    "epoch": EPOCH_CASE,
    # shared-context fields (P3/P4): SYSCALL exe wins over the AVC exe
    # planted on doc_id%11 rows (P13); exit is errno-translated (P10)
    "exe": EXE_CASE,
    "cwd": CWD_CASE,
    "syscall": SYSCALL_CASE,
    "exit": EXIT_NAME_CASE,
    "success": SUCCESS_CASE,
    "proctitle": CMDLINE_CASE,
    "execve_cmdline": CMDLINE_CASE,
    "saddr": (
        f"(case when doc_id % 5 = 3 and doc_id % 2 = 1 then {SADDR_CASE} "
        f"else cast(null as string) end)"
    ),
    "saddr_struct": (
        f"(case when doc_id % 5 = 3 and doc_id % 2 = 0 then {SADDR_STRUCT_CASE} "
        f"else cast(null as string) end)"
    ),
}

# --- analyzer/detector synthetic group-table domains (D1-D4, AN1/3/4/5) ----
# A deterministic group table derived from doc_id, planting each detector's
# trigger: unlabeled_t targets (AN1), setfiles_t+relabelfrom (AN3),
# init_t→lib_t (AN4), 17 distinct sources on one target (AN5), dontaudit
# indicator perms / permissive / container / custom paths (D1-D4).
AZ_STYPE = (
    "(case when doc_id % 10 = 1 then 'svc' || cast(doc_id % 17 as string) || '_t' "
    "when doc_id % 10 = 3 then 'setfiles_t' "
    "when doc_id % 10 = 6 then 'init_t' else 'httpd_t' end)"
)
AZ_TTYPE = (
    "(case when doc_id % 10 = 0 then 'unlabeled_t' "
    "when doc_id % 10 = 1 then 'shared_target_t' "
    "when doc_id % 10 = 6 then 'lib_t' "
    # AN2 plant: 5 distinct core system types carried at the wrong MLS level
    "when doc_id % 10 = 8 then (case cast(floor(doc_id / 10.0) as int) % 5 "
    "when 0 then 'etc_t' when 1 then 'bin_t' when 2 then 'usr_t' "
    "when 3 then 'root_t' else 'boot_t' end) "
    "else 'var_log_t' end)"
)
# target MLS level: s15 on the AN2-planted rows, s0 elsewhere
AZ_TMLS = "(case when doc_id % 10 = 8 then 's15' else 's0' end)"
AZ_COMM = (
    "(case when doc_id % 10 = 3 then 'setfiles' "
    "when doc_id % 10 = 6 then 'init' else 'httpd' end)"
)
AZ_PERM = "(case when doc_id % 10 = 3 then 'relabelfrom' else 'read' end)"
AZ_CNT = "cast((doc_id % 5) + 1 as bigint)"
AZ_PERMISSIVE = "(case when doc_id % 7 = 0 then '1' else '0' end)"
# detector path domain: container / custom(/opt, /usr/local) / neutral
AZ_DPERM = (
    "(case doc_id % 6 when 0 then 'noatsecure' when 2 then 'rlimitinh' "
    "when 4 then 'siginh' else 'read' end)"
)
AZ_DPATH = (
    "(case doc_id % 5 when 0 then '/var/lib/containers/storage/ov1/payload' "
    "when 1 then '/opt/app/data.bin' "
    "when 2 then '/var/www/html/index.html' "
    "when 3 then '/usr/local/bin/tool' "
    "else '/etc/passwd' end)"
)

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
    # CWD-resolved cascade paths take the cwd's pattern branch
    f"when {CASCADE_CWD} and doc_id % 4 = 0 then '/var/www(/.*)?' "
    f"when {CASCADE_CWD} and doc_id % 4 = 1 then '/var/lib(/.*)?' "
    f"when {CASCADE_CWD} and doc_id % 4 = 2 then '/etc(/.*)?' "
    f"when {CASCADE_CWD} then '/srv/app/*' "
    "when doc_id % 6 = 0 then '/var/www(/.*)?' "
    "when doc_id % 6 = 1 then '/etc(/.*)?' "
    "when doc_id % 6 = 2 then '/home/[^/]+(/.*)?' "
    "when doc_id % 6 = 3 then '/tmp(/.*)?' "
    "when doc_id % 6 = 5 then '/var/log(/.*)?' "
    f"when doc_id % 5 = 4 then {PATH_CASE} "
    "else '/opt/app/*' end)"
)

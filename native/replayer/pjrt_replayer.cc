// Native exported-program replayer over the PJRT C API.
//
// C++ equivalent of the reference's iOS kernel-schedule replayer (Yolo.m:
// load a frozen compute schedule, compile pipelines, replay per frame) for
// TPU hosts: dlopen a PJRT plugin (libtpu.so by default), compile the raw
// StableHLO MLIR from a .ccprog bundle (program.mlir, see
// clearcam_tpu/tools/export.py), and execute it on raw frame bytes — no
// Python, no model code.
//
// Usage:
//   pjrt_replayer probe [plugin.so] [key=value ...]
//   pjrt_replayer run program.mlir N_IN_BYTES [plugin.so] [key=value ...]
//     compile + execute on a zeroed uint8 input; writes every output
//     buffer's raw bytes to replayer_out<i>.bin for comparison against the
//     framework's own execution.
//
// key=value pairs become PJRT_NamedValues for PJRT_Client_Create (all-digit
// values are sent as int64) — e.g. the axon relay plugin needs
// remote_compile/topology/session_id; libtpu.so needs none.
//
// Build: make -C native replayer  (target: build/pjrt_replayer)

#include <dlfcn.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

static const PJRT_Api* load_api(const char* path) {
  void* lib = dlopen(path, RTLD_NOW | RTLD_LOCAL);
  if (!lib) {
    fprintf(stderr, "dlopen(%s) failed: %s\n", path, dlerror());
    return nullptr;
  }
  using GetApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetApiFn>(dlsym(lib, "GetPjrtApi"));
  if (!get_api) {
    fprintf(stderr, "GetPjrtApi not found in %s\n", path);
    return nullptr;
  }
  return get_api();
}

static std::string error_message(const PJRT_Api* api, PJRT_Error* err) {
  if (!err) return "";
  PJRT_Error_Message_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  args.error = err;
  api->PJRT_Error_Message(&args);
  std::string msg(args.message, args.message_size);
  PJRT_Error_Destroy_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  api->PJRT_Error_Destroy(&dargs);
  return msg;
}

#define CHECK_OK(api, expr)                                       \
  do {                                                            \
    PJRT_Error* _err = (expr);                                    \
    if (_err) {                                                   \
      fprintf(stderr, "%s failed: %s\n", #expr,                   \
              error_message(api, _err).c_str());                  \
      return 1;                                                   \
    }                                                             \
  } while (0)

// minimal hand-encoded xla.CompileOptionsProto:
//   executable_build_options { num_replicas: 1  num_partitions: 1 }
// (field 3 = executable_build_options; its fields 4/5 = replicas/partitions)
static std::string default_compile_options() {
  const unsigned char raw[] = {0x1a, 0x04, 0x20, 0x01, 0x28, 0x01};
  return std::string(reinterpret_cast<const char*>(raw), sizeof(raw));
}

// "key=value" CLI pairs -> PJRT_NamedValues (all-digit value => int64).
// `keys`/`vals` own the strings; they must outlive the returned vector.
static std::vector<PJRT_NamedValue> parse_named_values(
    int argc, char** argv, int start, std::vector<std::string>* keys,
    std::vector<std::string>* vals) {
  for (int i = start; i < argc; i++) {
    const char* eq = strchr(argv[i], '=');
    if (!eq) continue;
    keys->emplace_back(argv[i], eq - argv[i]);
    vals->emplace_back(eq + 1);
  }
  std::vector<PJRT_NamedValue> out(keys->size());
  for (size_t i = 0; i < keys->size(); i++) {
    PJRT_NamedValue& nv = out[i];
    memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = (*keys)[i].c_str();
    nv.name_size = (*keys)[i].size();
    const std::string& v = (*vals)[i];
    bool all_digits = !v.empty() && v.find_first_not_of("0123456789") == std::string::npos;
    if (all_digits) {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = atoll(v.c_str());
      nv.value_size = 1;
    } else {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = v.c_str();
      nv.value_size = v.size();
    }
  }
  return out;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr,
            "usage: %s probe [plugin.so] [k=v ...] | "
            "run <program.mlir> <in_bytes> [plugin.so] [k=v ...]\n",
            argv[0]);
    return 2;
  }
  std::string mode = argv[1];
  const char* plugin = "libtpu.so";
  int opt_start = argc;
  if (mode == "probe") {
    if (argc > 2) plugin = argv[2];
    opt_start = 3;
  } else if (mode == "run") {
    if (argc > 4) plugin = argv[4];
    opt_start = 5;
  }

  const PJRT_Api* api = load_api(plugin);
  if (!api) return 1;
  printf("plugin %s: PJRT API %d.%d\n", plugin, api->pjrt_api_version.major_version,
         api->pjrt_api_version.minor_version);

  {
    PJRT_Plugin_Initialize_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    CHECK_OK(api, api->PJRT_Plugin_Initialize(&args));
  }

  std::vector<std::string> opt_keys, opt_vals;
  std::vector<PJRT_NamedValue> create_opts =
      parse_named_values(argc, argv, opt_start, &opt_keys, &opt_vals);

  PJRT_Client_Create_Args cargs;
  memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = create_opts.data();
  cargs.num_options = create_opts.size();
  CHECK_OK(api, api->PJRT_Client_Create(&cargs));
  PJRT_Client* client = cargs.client;

  PJRT_Client_Devices_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Client_Devices_Args_STRUCT_SIZE;
  dargs.client = client;
  CHECK_OK(api, api->PJRT_Client_Devices(&dargs));
  printf("devices: %zu\n", dargs.num_devices);
  if (mode == "probe") return 0;

  if (argc < 4) {
    fprintf(stderr, "run mode needs <program.mlir> <in_bytes>\n");
    return 2;
  }
  std::ifstream f(argv[2], std::ios::binary);
  if (!f) {
    fprintf(stderr, "cannot read %s\n", argv[2]);
    return 1;
  }
  std::string mlir((std::istreambuf_iterator<char>(f)),
                   std::istreambuf_iterator<char>());
  // arg 3: input byte count (zero-filled) OR a file whose bytes are the input
  long in_bytes;
  std::vector<uint8_t> input_data;
  {
    std::ifstream inf(argv[3], std::ios::binary);
    if (inf) {
      input_data.assign((std::istreambuf_iterator<char>(inf)),
                        std::istreambuf_iterator<char>());
      in_bytes = input_data.size();
      printf("input: %ld bytes from %s\n", in_bytes, argv[3]);
    } else {
      in_bytes = atol(argv[3]);
      input_data.assign(in_bytes, 0);
    }
  }

  PJRT_Program program;
  memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(mlir.data());
  program.code_size = mlir.size();
  static const char kMlir[] = "mlir";
  program.format = kMlir;
  program.format_size = sizeof(kMlir) - 1;

  std::string copts = default_compile_options();
  PJRT_Client_Compile_Args comp;
  memset(&comp, 0, sizeof(comp));
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  comp.compile_options = copts.data();
  comp.compile_options_size = copts.size();
  CHECK_OK(api, api->PJRT_Client_Compile(&comp));
  printf("compiled %s (%zu bytes mlir)\n", argv[2], mlir.size());
  PJRT_LoadedExecutable* exe = comp.executable;

  // input: uint8 buffer on device 0
  std::vector<uint8_t>& host_in = input_data;
  std::vector<int64_t> dims = {in_bytes};
  PJRT_Client_BufferFromHostBuffer_Args b;
  memset(&b, 0, sizeof(b));
  b.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  b.client = client;
  b.data = host_in.data();
  b.type = PJRT_Buffer_Type_U8;
  b.dims = dims.data();
  b.num_dims = 1;
  b.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  b.device = dargs.devices[0];
  CHECK_OK(api, api->PJRT_Client_BufferFromHostBuffer(&b));
  // NOTE: the executable's real input shape comes from the MLIR signature;
  // PJRT reshapes a dense row-major buffer of matching size.
  PJRT_Buffer* in_buf = b.buffer;
  if (b.done_with_host_buffer) {
    PJRT_Event_Await_Args ev;
    memset(&ev, 0, sizeof(ev));
    ev.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    ev.event = b.done_with_host_buffer;
    CHECK_OK(api, api->PJRT_Event_Await(&ev));
    PJRT_Event_Destroy_Args ed;
    memset(&ed, 0, sizeof(ed));
    ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    ed.event = b.done_with_host_buffer;
    api->PJRT_Event_Destroy(&ed);
  }

  PJRT_ExecuteOptions opts;
  memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  PJRT_Buffer* const arg_list[] = {in_buf};
  PJRT_Buffer* const* arg_lists[] = {arg_list};
  std::vector<PJRT_Buffer*> out(8, nullptr);
  PJRT_Buffer** out_list[] = {out.data()};
  PJRT_LoadedExecutable_Execute_Args ex;
  memset(&ex, 0, sizeof(ex));
  ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  ex.executable = exe;
  ex.options = &opts;
  ex.argument_lists = arg_lists;
  ex.num_devices = 1;
  ex.num_args = 1;
  ex.output_lists = out_list;
  CHECK_OK(api, api->PJRT_LoadedExecutable_Execute(&ex));

  // read every output back and dump raw bytes for host-side comparison
  for (size_t i = 0; i < out.size() && out[i]; i++) {
    PJRT_Buffer_ToHostBuffer_Args th;
    memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = out[i];
    CHECK_OK(api, api->PJRT_Buffer_ToHostBuffer(&th));  // query size
    std::vector<uint8_t> host_out(th.dst_size);
    th.dst = host_out.data();
    CHECK_OK(api, api->PJRT_Buffer_ToHostBuffer(&th));
    if (th.event) {
      PJRT_Event_Await_Args ev;
      memset(&ev, 0, sizeof(ev));
      ev.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      ev.event = th.event;
      CHECK_OK(api, api->PJRT_Event_Await(&ev));
      PJRT_Event_Destroy_Args ed;
      memset(&ed, 0, sizeof(ed));
      ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      ed.event = th.event;
      api->PJRT_Event_Destroy(&ed);
    }
    char name[64];
    snprintf(name, sizeof(name), "replayer_out%zu.bin", i);
    std::ofstream of(name, std::ios::binary);
    of.write(reinterpret_cast<const char*>(host_out.data()), host_out.size());
    printf("output %zu: %zu bytes -> %s\n", i, host_out.size(), name);
  }
  printf("executed ok\n");
  return 0;
}

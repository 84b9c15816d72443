// Standalone force server: the socket-IPC analog of the reference's
// pysiesta bridge (pysiesta/siesta.f90 wraps Siesta's fsiesta client,
// which talks to a separate MPI process over an INET socket).
//
// Protocol (all little-endian, length-prefixed binary):
//   client -> server:  'I' int32 natoms, float64 x0[3N], float64 cell[3]
//                      + engine setup: int32 which (1=LJ, 2=Morse),
//                        float64 params[4]
//   client -> server:  'F' float64 x[3N]      (request forces)
//   server -> client:  float64 energy, float64 f[3N]
//   client -> server:  'Q'                    (quit)
//
// Build: g++ -O2 -o force_server force_server.cpp sclmd_forces.cpp
// Run:   ./force_server <port>

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
void* sclmd_engine_create(int natoms, const double* x0, const double* cell);
void sclmd_engine_destroy(void* h);
void sclmd_set_lj(void* h, double eps, double sigma, double rcut);
void sclmd_set_morse(void* h, double D, double alpha, double r0, double rcut);
int sclmd_build_neighbors(void* h, double cutoff, double skin);
double sclmd_forces(void* h, const double* x, double* f);
}

static bool read_exact(int fd, void* buf, size_t n) {
  char* p = static_cast<char*>(buf);
  while (n > 0) {
    ssize_t r = read(fd, p, n);
    if (r <= 0) return false;
    p += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

static bool write_exact(int fd, const void* buf, size_t n) {
  const char* p = static_cast<const char*>(buf);
  while (n > 0) {
    ssize_t r = write(fd, p, n);
    if (r <= 0) return false;
    p += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

static int serve(int in_fd, int out_fd);

int main(int argc, char** argv) {
  // pipe mode: speak the protocol over stdin/stdout (the reference's
  // pysiesta "pipes" build variant, pysiesta/Makefile:48-56)
  if (argc > 1 && strcmp(argv[1], "--stdio") == 0) {
    return serve(0, 1);
  }
  int port = argc > 1 ? atoi(argv[1]) : 10001;

  int srv = socket(AF_INET, SOCK_STREAM, 0);
  int opt = 1;
  setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &opt, sizeof(opt));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (bind(srv, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    perror("bind");
    return 1;
  }
  listen(srv, 1);
  fprintf(stderr, "force_server: listening on port %d\n", port);

  int fd = accept(srv, nullptr, nullptr);
  if (fd < 0) {
    perror("accept");
    return 1;
  }
  int rc = serve(fd, fd);
  close(fd);
  close(srv);
  fprintf(stderr, "force_server: bye\n");
  return rc;
}

static int serve(int in_fd, int out_fd) {
  void* engine = nullptr;
  int natoms = 0;
  std::vector<double> x, f;

  char cmd;
  while (read_exact(in_fd, &cmd, 1)) {
    if (cmd == 'I') {
      int32_t na = 0;
      if (!read_exact(in_fd, &na, 4)) break;
      natoms = na;
      std::vector<double> x0(3 * natoms), cell(3);
      if (!read_exact(in_fd, x0.data(), 8 * x0.size())) break;
      if (!read_exact(in_fd, cell.data(), 24)) break;
      int32_t which = 0;
      double params[4];
      if (!read_exact(in_fd, &which, 4)) break;
      if (!read_exact(in_fd, params, 32)) break;
      if (engine) sclmd_engine_destroy(engine);
      engine = sclmd_engine_create(natoms, x0.data(), cell.data());
      if (which == 1)
        sclmd_set_lj(engine, params[0], params[1], params[2]);
      else
        sclmd_set_morse(engine, params[0], params[1], params[2], params[3]);
      int np = sclmd_build_neighbors(engine, params[2 + (which == 2)], 0.4);
      x.resize(3 * natoms);
      f.resize(3 * natoms);
      int32_t ack = np;
      write_exact(out_fd, &ack, 4);
    } else if (cmd == 'F') {
      if (!engine || !read_exact(in_fd, x.data(), 8 * x.size())) break;
      double energy = sclmd_forces(engine, x.data(), f.data());
      write_exact(out_fd, &energy, 8);
      write_exact(out_fd, f.data(), 8 * f.size());
    } else if (cmd == 'Q') {
      break;
    }
  }
  if (engine) sclmd_engine_destroy(engine);
  return 0;
}

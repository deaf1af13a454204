package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class SecretConfigSpec extends AnyFunSuite {

  test("env-only resolution when no store is configured") {
    val c = new SecretConfig(env = Map("api_key" -> "k-env"))
    assert(c.get("api_key").contains("k-env"))
    assert(c.get("absent").isEmpty)
    intercept[NoSuchElementException](c.required("absent"))
  }

  test("configured store wins over env for names it defines") {
    val f = Files.createTempFile("secrets", ".properties")
    Files.write(f, "api_key=k-store\napi_secret=s-store\n".getBytes("UTF-8"))
    val c = new SecretConfig(
      env = Map("api_key" -> "k-env", "other" -> "o-env"),
      storeFile = Some(f))
    assert(c.required("api_key") == "k-store") // store precedence
    assert(c.required("api_secret") == "s-store") // store-only name
    assert(c.required("other") == "o-env") // env fallback
  }

  test("store pointer can come from the environment itself") {
    val f = Files.createTempFile("secrets2", ".properties")
    Files.write(f, "api_key=k-ptr\n".getBytes("UTF-8"))
    val c = new SecretConfig(env = Map(
      SecretConfig.StorePointerVar -> f.toString,
      "api_key" -> "k-env"))
    assert(c.required("api_key") == "k-ptr")
  }

  test("dangling store pointer degrades to env") {
    val c = new SecretConfig(env = Map(
      SecretConfig.StorePointerVar -> "/nonexistent/secrets.properties",
      "api_key" -> "k-env"))
    assert(c.required("api_key") == "k-env")
  }
}
